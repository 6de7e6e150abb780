"""Same-window end-to-end A/B of headline tile plans.

The auto planner picks 16 x 576x256 @ batch 8 for 1080p (overlap ratio
1.138).  A single-row 1088x256 strip grid has no horizontal seams and
only 8 pad rows (ratio 1.075, -5.5% processed pixels) but needs batch 4
to stay under the dispatch-group pixel cap — and the cost model charges
batch<=4 a 2.0x penalty derived indirectly from a batch-1 chain config.
This measures the REAL end-to-end trade on the production TiledRunner:
alternating timed runs of each plan in one process (same time window),
full pipeline (extract + fused-Pallas forward + recompose).

Usage:  nohup python tools/plan_ab.py > /tmp/plan_ab.log 2>&1 &
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
    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    H, W, SCALE = 1080, 1920, 4
    dtype = jnp.bfloat16
    model, params = SP.build("esrgan", scale=SCALE, dtype=dtype, nb=23, nf=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, H, W, 3), np.float32), dtype)
    out_mp = H * W * SCALE * SCALE / 1e6

    def runner(mode, tile, tb):
        return TiledRunner(
            model.apply, SCALE, mode=mode, tile=tile, overlap=16,
            tile_batch=tb, compute_dtype=dtype, max_group_px=1_400_000,
            tile_quantum=model.tile_quantum,
            tile_quantum_strict=model.tile_quantum_strict,
            trunk_fn=model.apply_trunk, tail_fn=model.apply_tail)

    configs = {
        "auto_b8": runner("auto", 256, 8),
        # whole-image trunk (1088x1920, 64x320 blocks, px ratio 1.0074)
        # + tiled tail: engine.hybrid_apply
        "hybrid": runner("hybrid", 256, 8),
        "strip_1088x256_b4": runner("uniform", (1088, 256), 4),
        "strip_1088x256_b8": runner("uniform", (1088, 256), 8),
    }

    results = {}
    runs = {}
    for name, r in list(configs.items()):
        plan = r.plan_for(H, W, run_dtype=dtype)
        print(name, "plan", plan.tile_h, plan.tile_w, plan.n_tiles,
              "ratio", round(plan.tile_h * plan.tile_w * plan.n_tiles
                             / (H * W), 3), flush=True)
        try:
            t0 = time.perf_counter()
            sync(r(params, x))
            results[name] = {"compile_s": round(time.perf_counter() - t0, 1)}
            runs[name] = r
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(name, results[name], flush=True)

    # alternate timed runs so every config shares the same window
    times = {name: [] for name in runs}
    for _ in range(4):
        for name, r in runs.items():
            t0 = time.perf_counter()
            sync(r(params, x))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        dt = sorted(ts)[len(ts) // 2]
        results[name].update({
            "s_median": round(dt, 4), "mps": round(out_mp / dt, 2),
            "all_s": [round(t, 4) for t in ts]})
        print(name, results[name], flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/plan_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
