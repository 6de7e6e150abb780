"""Re-measure the tile-batch penalty that gates tall-strip plans.

make_auto_plan's cost model charges batch_penalty(chunk<=4) = 2.0
(derived indirectly from a batch-1 chain config).  That single constant
is what rejects 1088x256-strip plans for 1080p (8 tiles x batch 4 =
1.11M px/group fits the cap; the x2 penalty makes them lose to
16 x 576x256 @ batch 8).  This probes the REAL penalty: the same RRDB
trunk forward timed at (batch 8, 576x256) vs (batch 4, 1088x256) vs
(batch 4, 576x256) in one window — per-pixel cost ratios give the
penalty directly.

Usage:  nohup python tools/batch_penalty_ab.py > /tmp/batchpen.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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

    results = {}
    model, params = SP.build("esrgan", scale=4, dtype=jnp.bfloat16,
                             nb=23, nf=64)

    key = jax.random.PRNGKey(0)
    configs = [("b8_576x256", 8, 576, 256),
               ("b4_1088x256", 4, 1088, 256),
               ("b4_576x256", 4, 576, 256),
               ("b2_1088x512", 2, 1088, 512)]
    for name, b, h, w in configs:
        key, kx = jax.random.split(key)
        x = jax.random.normal(kx, (b, h, w, 3), jnp.bfloat16)
        try:
            t0 = time.perf_counter()
            fwd = jax.jit(lambda t: model.apply(params, t))
            y = fwd(x)
            sync(y)
            compile_s = time.perf_counter() - t0
            # chain iterations via a downscaled feedback to keep device-
            # side dependencies (unfetched dispatches can be dropped)
            feed = jax.jit(lambda t, y: t + 1e-6 * jnp.mean(
                y.astype(jnp.float32)))
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                x = feed(x, y)
                y = fwd(x)
            sync(y)
            dt = (time.perf_counter() - t0) / n
            results[name] = {
                "ms": round(dt * 1e3, 1),
                "ns_per_px": round(dt / (b * h * w) * 1e9, 3),
                "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:250]}"}
        print(name, results[name], flush=True)

    base = results.get("b8_576x256", {}).get("ns_per_px")
    if base:
        for name in list(results):
            npp = results[name].get("ns_per_px")
            if npp:
                results[name]["penalty_vs_b8"] = round(npp / base, 3)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/batch_penalty_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
