"""Decompose the headline bench time into trunk / tail / tiling overhead.

The headline (4x RRDB nb=23 nf=64, 1080p->4K tiled, bf16) spends its time
in: the RDB trunk (69 fused kernels), the LR-collapsed upsample + HR-conv
tail, and the tiling machinery (pad/extract/blend/recompose + dispatch).
This tool times each piece at the REAL plan shapes so optimization effort
goes where the milliseconds are.  All timings are chained+synced (see
CLAUDE.md: unsynced dispatches can be dropped on this platform).

Usage (TPU):  nohup python tools/headline_breakdown.py > /tmp/breakdown.log 2>&1 &
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

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()

    from innfer_tpu.tiling import engine as E
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
    H, W, NB, NF, SCALE = 1080, 1920, 23, 64, 4
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    model, params = SP.build("esrgan", scale=SCALE, dtype=dtype, nb=NB, nf=NF)
    runner = TiledRunner(
        model.apply, SCALE, mode="auto", tile=256, overlap=16, tile_batch=8,
        compute_dtype=dtype, max_group_px=1_400_000,
        tile_quantum=model.tile_quantum,
        tile_quantum_strict=model.tile_quantum_strict)
    x = jnp.asarray(rng.random((1, H, W, 3), np.float32), dtype)

    plan = runner.plan_for(H, W, run_dtype=dtype)
    results["plan"] = {
        "tile_h": plan.tile_h, "tile_w": plan.tile_w,
        "n_tiles": plan.n_tiles, "pad_h": plan.pad_h, "pad_w": plan.pad_w,
        "overlap_px_ratio": round(
            plan.n_tiles * plan.tile_h * plan.tile_w / (H * W), 3),
    }
    print("plan", results["plan"], flush=True)

    # 1. full product step
    dt_full = timed(lambda: runner(params, x))
    results["full_s"] = round(dt_full, 4)
    mps = H * W * SCALE ** 2 / dt_full / 1e6
    results["full_mps"] = round(mps, 2)
    print("full", results["full_s"], "s =", results["full_mps"], "MP/s",
          flush=True)

    # 2. model-only on one chunk (x n_chunks = model total)
    chunk = min(8, plan.n_tiles)
    n_chunks = -(-plan.n_tiles // chunk)
    xt = jnp.asarray(
        rng.random((chunk, plan.tile_h, plan.tile_w, 3), np.float32), dtype)
    fwd = jax.jit(model.apply)
    dt_model = timed(lambda: fwd(params, xt))
    results["model_chunk_s"] = round(dt_model, 4)
    results["model_total_s"] = round(dt_model * n_chunks, 4)
    print("model chunk", dt_model, "x", n_chunks, "=",
          results["model_total_s"], flush=True)

    # 3. trunk-only on the same chunk (69 fused RDBs at tile shapes)
    from innfer_tpu.ops.pallas.rdb import fused_rdb

    ws = [params[f"model.1.sub.0.RDB1.conv{c}.0.weight"] for c in range(1, 6)]
    bs = [params[f"model.1.sub.0.RDB1.conv{c}.0.bias"] for c in range(1, 6)]
    feat = jnp.asarray(
        rng.random((chunk, plan.tile_h, plan.tile_w, NF), np.float32), dtype)
    from jax import lax

    trunk = jax.jit(lambda t: lax.scan(
        lambda c, _: (fused_rdb(c, ws, bs, gc=32), None),
        t, None, length=3 * NB)[0])
    dt_trunk = timed(lambda: trunk(feat))
    results["trunk_chunk_s"] = round(dt_trunk, 4)
    results["trunk_total_s"] = round(dt_trunk * n_chunks, 4)
    flops = 2 * 9 * feat.size / NF * sum(
        (NF + k * 32) * (32 if k < 4 else NF) for k in range(5)) * 3 * NB
    results["trunk_tfs"] = round(flops / dt_trunk / 1e12, 1)
    print("trunk chunk", dt_trunk, "x", n_chunks, "=",
          results["trunk_total_s"], f"({results['trunk_tfs']} TF/s)",
          flush=True)

    # 4. tiling machinery only: pad/extract/blend/recompose + dispatch with
    # a traffic-only "model" (channel-tile + pixel shuffle to 4x)
    def fake_apply(_p, t):
        from innfer_tpu.nn import functional as F

        return F.pixel_shuffle(jnp.tile(t, (1, 1, 1, SCALE * SCALE)), SCALE)

    tiler = TiledRunner(fake_apply, SCALE, mode="auto", tile=256, overlap=16,
                        tile_batch=8, compute_dtype=dtype,
                        max_group_px=1_400_000, tile_quantum=64)
    dt_tiling = timed(lambda: tiler(None, x))
    results["tiling_overhead_s"] = round(dt_tiling, 4)
    print("tiling machinery", results["tiling_overhead_s"], flush=True)

    # 5. head+tail = model - trunk (fea conv, LR conv, upsample, HR convs)
    results["tail_total_s"] = round(
        results["model_total_s"] - results["trunk_total_s"], 4)
    # 6. dispatch/glue = full - model - tiling
    results["glue_s"] = round(
        dt_full - results["model_total_s"] - dt_tiling, 4)
    print(json.dumps(results, indent=2))
    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/headline_breakdown.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
