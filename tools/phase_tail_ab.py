"""Same-window A/B of the phase-space tail (nn/phase.py) on the real chip.

Times the FULL jitted model forward (fused-Pallas trunk + tail) at the
headline chunk shape with the phase tail on vs forced-materialized, plus
on-chip parity between the two paths.  The gate is the trace-time
predicate models.common.phase_tail_ok (the INNFER_PHASE_TAIL env hook was
deleted 2026-08-19 after this tool's artifact showed phase exact+faster),
so both variants can be traced in one process (same time window — the
only comparison this backend allows, see CLAUDE.md).

Usage:  nohup python tools/phase_tail_ab.py > /tmp/phase_ab.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()
    from tools import synth_params as SP

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(run, *a, n=3, warm=1):
        for _ in range(warm):
            sync(run(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            sync(run(*a))
        return (time.perf_counter() - t0) / n

    results = {}
    dtype = jnp.bfloat16
    model, params = SP.build("esrgan", scale=4, dtype=dtype, nb=23, nf=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 576, 256, 3), np.float32), dtype)

    from innfer_tpu.models import common as C

    real_ok = C.phase_tail_ok
    C.phase_tail_ok = lambda *a, **k: False
    fwd_mat = jax.jit(model.apply)
    y_mat = fwd_mat(params, x)
    sync(y_mat)
    C.phase_tail_ok = real_ok
    fwd_ph = jax.jit(model.apply)
    y_ph = fwd_ph(params, x)
    sync(y_ph)

    d = np.asarray(jnp.max(jnp.abs(y_ph.astype(jnp.float32)
                                   - y_mat.astype(jnp.float32))))
    mse = np.mean((np.asarray(y_ph, np.float64)
                   - np.asarray(y_mat, np.float64)) ** 2)
    results["parity_maxabs"] = float(d)
    results["parity_psnr"] = (float("inf") if mse == 0
                              else float(10 * np.log10(1.0 / mse)))
    print("parity", results["parity_maxabs"], results["parity_psnr"],
          flush=True)

    px = x.shape[0] * x.shape[1] * x.shape[2] * 16
    for name, fwd in (("materialized", fwd_mat), ("phase", fwd_ph)):
        dt = timed(fwd, params, x)
        results[name] = {"s": round(dt, 4),
                         "mps": round(px / dt / 1e6, 2)}
        print(name, results[name], flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/phase_tail_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
