"""Decompose CycleGAN ResNet-9 tile time (VERDICT r3 item: 0.47-0.60x).

The bench config (540p tiled, ngf=64) reaches only ~85% FLOP-normalized
efficiency and ~10 MP/s.  This times the pieces on real tile shapes to
find the missing milliseconds:

  * full tiled product step,
  * trunk: 9 ResnetBlocks at tile/4 spatial, 4*ngf channels — as-built
    (reflect pad + IN), zero-pad variant (is the pad copy expensive?),
    no-IN variant (are the stat passes expensive?),
  * head/tail: 7x7 convs, strided downs, deconv ups.

Chained+synced timing throughout (CLAUDE.md).
Usage (TPU):  nohup python tools/cyclegan_breakdown.py > /tmp/cg.log 2>&1 &
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
    import numpy as np
    from jax import lax

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()

    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(fn, n=3, warm=1):
        for _ in range(warm):
            sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn())
        return (time.perf_counter() - t0) / n

    results = {}
    H, W = 540, 960
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    model, params = SP.build("cyclegan", dtype=dtype, n_blocks=9, ngf=64)

    runner = TiledRunner(model.apply, 1, mode="auto", tile=256, overlap=16,
                         tile_batch=8, compute_dtype=dtype,
                         max_group_px=1_400_000)
    x = jnp.asarray(rng.random((1, H, W, 3), np.float32) * 2 - 1, dtype)
    plan = runner.plan_for(H, W, run_dtype=dtype)
    results["plan"] = {"tile_h": plan.tile_h, "tile_w": plan.tile_w,
                       "n_tiles": plan.n_tiles}
    print("plan", results["plan"], flush=True)

    dt_full = timed(lambda: runner(params, x))
    results["full_s"] = round(dt_full, 4)
    results["full_mps"] = round(H * W / dt_full / 1e6, 2)
    print("full", results["full_s"], "s =", results["full_mps"], "MP/s",
          flush=True)

    # model-only on one chunk
    chunk = min(8, plan.n_tiles)
    n_chunks = -(-plan.n_tiles // chunk)
    xt = jnp.asarray(rng.random(
        (chunk, plan.tile_h, plan.tile_w, 3), np.float32) * 2 - 1, dtype)
    fwd = jax.jit(model.apply)
    dt_model = timed(lambda: fwd(params, xt))
    results["model_chunk_s"] = round(dt_model, 4)
    results["model_total_s"] = round(dt_model * n_chunks, 4)
    print("model", results["model_total_s"], flush=True)

    # trunk blocks at tile/4 spatial, 4*ngf channels
    C = 256
    bh, bw = plan.tile_h // 4, plan.tile_w // 4
    feat = jnp.asarray(rng.random((chunk, bh, bw, C), np.float32), dtype)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    w1 = jax.random.normal(k1, (3, 3, C, C), jnp.float32) * 0.02
    w2 = jax.random.normal(k2, (3, 3, C, C), jnp.float32) * 0.02

    def conv(t, w, pad_mode):
        if pad_mode == "reflect":
            t = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
            padding = [(0, 0), (0, 0)]
        else:
            padding = [(1, 1), (1, 1)]
        return lax.conv_general_dilated(
            t, w.astype(t.dtype), (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def inorm(t):
        m = jnp.mean(t, axis=(1, 2), keepdims=True)
        v = jnp.mean(jnp.square(t - m), axis=(1, 2), keepdims=True)
        return (t - m) * jax.lax.rsqrt(v + 1e-5)

    def block(t, pad_mode, use_in):
        h = conv(t, w1, pad_mode)
        h = inorm(h) if use_in else h
        h = jnp.maximum(h, 0).astype(t.dtype)
        h = conv(h, w2, pad_mode)
        h = inorm(h) if use_in else h
        return t + h.astype(t.dtype)

    nrep = 9
    flops = 2 * 2 * 9 * C * C * chunk * bh * bw * nrep
    for name, pad_mode, use_in in (
        ("blocks_reflect_in", "reflect", True),
        ("blocks_zeropad_in", "zero", True),
        ("blocks_reflect_noin", "reflect", False),
        ("blocks_zeropad_noin", "zero", False),
    ):
        run = jax.jit(lambda t, pm=pad_mode, ui=use_in: lax.scan(
            lambda c, _: (block(c, pm, ui), None), t, None, length=nrep)[0])
        dt = timed(lambda r=run: r(feat))
        results[name] = {"s_per_chunk": round(dt, 4),
                         "tfs": round(flops / dt / 1e12, 1)}
        print(name, results[name], flush=True)

    results["blocks_total_s"] = round(
        results["blocks_reflect_in"]["s_per_chunk"] * n_chunks, 4)
    results["headtail_total_s"] = round(
        results["model_total_s"] - results["blocks_total_s"], 4)
    results["tiling_glue_s"] = round(
        dt_full - results["model_total_s"], 4)
    print(json.dumps(results, indent=2))
    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/cyclegan_breakdown.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
