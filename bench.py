"""Headline benchmark: 4x RRDB (ESRGAN, nb=23 nf=64) 1080p -> 4K tiled upscale.

Runs on whatever JAX platform is active (real TPU chip under the driver).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is output megapixels per second per chip (a 1080p->4K upscale
produces 8.29 MP per input image); the BASELINE.json north-star target is
20 MP/s per v5e chip.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--nb", type=int, default=23)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--tile-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile", type=str, default="")
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.tiling.engine import TiledRunner
    from tools.synth_params import esrgan_model_and_params

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, params = esrgan_model_and_params(nb=args.nb, nf=args.nf,
                                            scale=args.scale, dtype=dtype)

    runner = TiledRunner(
        model.apply, model.scale, mode="uniform", tile=args.tile,
        overlap=args.overlap, tile_batch=args.tile_batch,
        compute_dtype=dtype,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((1, args.height, args.width, 3), dtype=np.float32), dtype=dtype
    )

    # On the tunneled axon platform block_until_ready() returns before the
    # device finishes; force completion by fetching a device-computed scalar.
    checksum = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    def sync(out):
        return float(checksum(out))

    # warmup/compile
    for _ in range(max(args.warmup, 1)):
        sync(runner(params, x))

    def timed_iters(n):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            runner(params, x)
        sync(runner(params, x))
        return time.perf_counter() - t0

    if args.profile:
        with jax.profiler.trace(args.profile):
            dt = timed_iters(args.iters)
    else:
        dt = timed_iters(args.iters)

    out_mp = (args.height * args.scale) * (args.width * args.scale) / 1e6
    mps = out_mp * args.iters / dt
    result = {
        "metric": (
            f"output megapixels/sec/chip, {args.scale}x RRDB(nb={args.nb}, "
            f"nf={args.nf}) {args.height}x{args.width} tiled upscale, {args.dtype}"
        ),
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / 20.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
