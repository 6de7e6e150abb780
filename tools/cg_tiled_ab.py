"""Locate the CycleGAN tiled-graph pathology.

Evidence so far: standalone 9-block chains run ~equal for XLA and the
fused kernel (~104 ms / 8 slabs), and bench (tile 320x256, 1 group) is
fast — but the parity run (tile 192, 2 groups) and the breakdown run
(tile 280x256, 1 group) take ~0.45 s/image with backend=auto.  This
times the full TiledRunner across (tile shape x group count x backend)
to isolate the trigger.

Usage (TPU): nohup python tools/cg_tiled_ab.py > /tmp/cgtab.log 2>&1 &
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.models import get_network
    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(fn, n=3):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn())
        return (time.perf_counter() - t0) / n

    results = {}
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    model, params = SP.build("cyclegan", dtype=dtype, n_blocks=9, ngf=64)

    configs = [
        # (name, image hw, tile, expect)
        ("t256_4tiles_1grp", (512, 512), 256),
        ("t192_9tiles_2grp", (512, 512), 192),
        ("t256_9tiles_2grp", (768, 768), 256),
        ("t320_4tiles_1grp", (640, 640), 320),
    ]
    for backend in ("pallas", "xla"):
        m = get_network(dict(model.cfg, backend=backend))
        for name, (h, w), tile in configs:
            runner = TiledRunner(m.apply, 1, mode="uniform", tile=tile,
                                 overlap=16, tile_batch=8,
                                 compute_dtype=dtype)
            x = jnp.asarray(rng.random((1, h, w, 3), np.float32) * 2 - 1,
                            dtype)
            try:
                dt = timed(lambda: runner(params, x))
                results[f"{name}_{backend}"] = {
                    "ms": round(dt * 1e3, 1),
                    "mps": round(h * w / dt / 1e6, 2)}
            except Exception as e:  # noqa: BLE001
                results[f"{name}_{backend}"] = {"error": str(e)[:150]}
            print(name, backend, results[f"{name}_{backend}"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
