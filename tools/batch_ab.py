"""On-chip A/B: batched directory mode vs per-image forwards.

Measures the stacked whole-image forward (pipeline.run_batch's compute
core) at bench-relevant configs for the scale-1 families whose batch-1
runs are dispatch-floor-bound (BASELINE.md): pix2pix UNet-256, CycleGAN
ResNet-9 at 540x960 (vs its tiled-auto default in the SAME window), and
WBC+guided-filter at 1080x1920.  Per-image MP/s should rise with N if
the floor is per-dispatch; flat MP/s means the ops themselves are
bandwidth/latency-bound at these shapes.

Drop-proof chained timing (CLAUDE.md): iteration k+1's input depends on
iteration k's output; ONE final fetch syncs the run.

Usage (TPU): nohup python tools/batch_ab.py > /tmp/batch_ab.log 2>&1 &
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

    from innfer_tpu.observability import device_sync, enable_compilation_cache
    from innfer_tpu.ops.filters import guided_filter
    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    enable_compilation_cache()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    chain_dep = jax.jit(
        lambda x, out: x + (out.ravel()[0] * 1e-30).astype(x.dtype))

    results = {}

    def timed(step, x0, out_mp, tag, n=4):
        try:
            device_sync(step(x0))  # compile + warm
            device_sync(chain_dep(x0, step(x0)))
            t0 = time.perf_counter()
            cur, out = x0, None
            for _ in range(n):
                out = step(cur)
                cur = chain_dep(cur, out)
            device_sync(out)
            dt = (time.perf_counter() - t0) / n
            results[tag] = {"s": round(dt, 4), "mps": round(out_mp / dt, 2)}
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:150]}
        print(tag, results[tag], flush=True)

    # pix2pix UNet-256 (the bench config is batch 8 already; sweep N)
    unet, unet_p = SP.build("unet", dtype=dtype, num_downs=8, ngf=64)
    unet_fwd = jax.jit(unet.apply)
    for n_img in (1, 8, 32):
        x = jnp.asarray(
            rng.random((n_img, 256, 256, 3), np.float32) * 2 - 1, dtype)
        timed(lambda t: unet_fwd(unet_p, t), x, n_img * 256 * 256 / 1e6,
              f"unet256_b{n_img}")

    # CycleGAN 540x960: tiled-auto batch-1 default vs whole-image batch N
    cg, cg_p = SP.build("cyclegan", dtype=dtype, n_blocks=9, ngf=64)
    runner = TiledRunner(cg.apply, 1, mode="auto", tile=256, overlap=16,
                         tile_batch=8, compute_dtype=dtype)
    x1 = jnp.asarray(rng.random((1, 540, 960, 3), np.float32) * 2 - 1, dtype)
    timed(lambda t: runner(cg_p, t), x1, 540 * 960 / 1e6, "cg_tiled_auto_b1")
    cg_fwd = jax.jit(cg.apply)
    for n_img in (1, 4, 8):
        x = jnp.asarray(
            rng.random((n_img, 540, 960, 3), np.float32) * 2 - 1, dtype)
        timed(lambda t: cg_fwd(cg_p, t), x, n_img * 540 * 960 / 1e6,
              f"cg_whole_b{n_img}")

    # WBC + guided filter at 1080x1920
    wbc, wbc_p = SP.build("wbc", dtype=dtype, nf=32)
    wbc_fwd = jax.jit(
        lambda p, t: guided_filter(t, wbc.apply(p, t), r=1, eps=5e-3))
    for n_img in (1, 4):
        x = jnp.asarray(
            rng.random((n_img, 1080, 1920, 3), np.float32) * 2 - 1, dtype)
        timed(lambda t: wbc_fwd(wbc_p, t), x, n_img * 1080 * 1920 / 1e6,
              f"wbc_b{n_img}")

    import os

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/batch_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
