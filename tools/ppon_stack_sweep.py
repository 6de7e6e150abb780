"""PPON cross-image tile stacking: dispatch-group size sweep (round 5).

tile_stack_ab.json showed PPON flat under stacking (7.5 -> 7.8 MP/s at b8)
while CycleGAN gained 1.88x: PPON's auto plan (8 tiles of 280x256, chunk 8
-> batched 16) only doubled the per-dispatch pixels before hitting the
1.4M group-px cap, and PPON has ~10x CycleGAN's op count per pixel, so its
per-op floor needs LARGER groups to amortize.  This sweep overrides the
plan's chunk directly (the cap was calibrated on ESRGAN's RDB memory
profile, not PPON) to find where PPON's throughput saturates or HBM stops
it; the winner sets the product batched-chunk policy in engine.tiled_apply.

    nohup python tools/ppon_stack_sweep.py > /tmp/ppon_sweep.log 2>&1 &

Writes tools/out/ppon_stack_sweep.json.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os.path as osp
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

OUT = osp.join(osp.dirname(osp.abspath(__file__)), "out",
               "ppon_stack_sweep.json")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.observability import device_sync, enable_compilation_cache
    from innfer_tpu.tiling import engine as E
    from tools import synth_params as SP

    enable_compilation_cache()
    dtype = jnp.bfloat16
    model, params = SP.build("ppon", scale=4, dtype=dtype, nb=24)
    rng = np.random.default_rng(0)
    h, w, nim = 540, 960, 8
    x = jnp.asarray(rng.random((nim, h, w, 3), np.float32), dtype)
    chain_dep = jax.jit(
        lambda t, out: t + (out.ravel()[0] * 1e-30).astype(t.dtype))

    runner = E.TiledRunner(
        model.apply, 4, mode="auto", tile=256, overlap=16, tile_batch=8,
        output_index=model.output_index, compute_dtype=dtype)
    plan = runner.plan_for(h, w, run_dtype=x.dtype)
    print(f"plan: tile {plan.tile_h}x{plan.tile_w} n {plan.n_tiles} "
          f"chunk {plan.chunk}", flush=True)

    rows = []
    for chunk in (16, 32, 64):
        p2 = dataclasses.replace(plan, chunk=chunk)
        fn = jax.jit(functools.partial(
            E.tiled_apply, model.apply, tile_batch=8,
            output_index=model.output_index, compute_dtype=dtype,
            max_group_px=chunk * plan.tile_h * plan.tile_w),
            static_argnames=("plan",))
        row = {"chunk": chunk,
               "group_px": chunk * plan.tile_h * plan.tile_w}
        try:
            t0 = time.time()
            out = fn(params, x, plan=p2)
            device_sync(out)
            row["compile_s"] = round(time.time() - t0, 1)
            iters = 3
            t0 = time.perf_counter()
            cur, out = x, None
            for _ in range(iters):
                out = fn(params, cur, plan=p2)
                cur = chain_dep(cur, out)
            device_sync(out)
            dt = time.perf_counter() - t0
            row["mps"] = round(nim * h * w * 16 * iters / dt / 1e6, 3)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(OUT, "w") as f:
        json.dump({"date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                   "what": ("PPON b8 tiled stacking, dispatch-group size "
                            "sweep (chunk override on the auto plan)"),
                   "plan": {"tile_h": plan.tile_h, "tile_w": plan.tile_w,
                            "n_tiles": plan.n_tiles, "chunk": plan.chunk},
                   "rows": rows}, f, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
