"""Where does the hybrid headline's 1.68 s/image actually go?

Times, in ONE process (same window): the full hybrid runner, the
whole-image trunk alone, the tiled tail alone (on a precomputed feature
map), and the glue (extract + recompose with an identity tail).  Then
the same full runner with a tail-grid variant (548-row tiles, overlap 8
= 2*tail_halo) to price the tail-grid overhead directly.

Usage (TPU): nohup python tools/hybrid_breakdown.py > /tmp/hybrid_bd.log 2>&1 &
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
    from innfer_tpu.tiling.plan import make_cover_plan
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

    ph, pw = E.hybrid_dims(H, W)
    print("trunk dims", ph, pw, flush=True)

    def cover(th, tw, ov):
        return make_cover_plan(ph, pw, SCALE, tile_h=min(ph, th),
                               tile_w=min(pw, tw), overlap=ov)

    plan576 = cover(576, 256, 16)
    plan548 = cover(548, 256, 8)
    for nm, p in (("576x256_ov16", plan576), ("548x256_ov8", plan548)):
        print(nm, "tiles", p.n_tiles, "processed_ratio",
              round(p.n_tiles * p.tile_h * p.tile_w / (ph * pw), 4),
              flush=True)

    def full(plan):
        def f(pp, xx):
            return E.hybrid_apply(
                model.apply_trunk, model.apply_tail, pp, xx, plan,
                tile_batch=8, compute_dtype=dtype, out_h=H * SCALE,
                out_w=W * SCALE)
        return jax.jit(f)

    trunk = jax.jit(lambda pp, xx: model.apply_trunk(
        pp, E._pad_to(xx, ph, pw).astype(dtype)))

    # tail alone on a precomputed trunk feature map (per plan)
    def tail_only(plan):
        def f(pp, hfeat):
            tiles = E.extract_tiles(hfeat, plan)
            n = plan.n_tiles
            chunk = plan.chunk or min(8, n)
            npad = E._round_up(n, chunk)
            if npad != n:
                tiles = jnp.pad(tiles,
                                [(0, npad - n), (0, 0), (0, 0), (0, 0)])
            groups = tiles.reshape(npad // chunk, chunk, plan.tile_h,
                                   plan.tile_w, -1)
            out = jax.lax.map(lambda g: model.apply_tail(pp, g), groups)
            tsh, tsw = plan.tile_h * plan.scale, plan.tile_w * plan.scale
            return E.recompose_tiles(
                out.reshape(npad, tsh, tsw, -1)[:n], plan)
        return jax.jit(f)

    hfeat = trunk(params, x)
    sync(hfeat)

    runs = {
        "full_576": (full(plan576), (params, x)),
        "full_548": (full(plan548), (params, x)),
        "trunk_only": (trunk, (params, x)),
        "tail_576": (tail_only(plan576), (params, hfeat)),
        "tail_548": (tail_only(plan548), (params, hfeat)),
    }
    results = {}
    for name, (fn, args) in list(runs.items()):
        t0 = time.perf_counter()
        try:
            sync(fn(*args))
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            del runs[name]
            continue
        results[name] = {"compile_s": round(time.perf_counter() - t0, 1)}
        print(name, results[name], flush=True)

    times = {n: [] for n in runs}
    for _ in range(4):
        for name, (fn, args) in runs.items():
            t0 = time.perf_counter()
            sync(fn(*args))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        dt = sorted(ts)[len(ts) // 2]
        results[name].update(
            {"s_median": round(dt, 4),
             "mps": round(out_mp / dt, 2),
             "all_s": [round(t, 4) for t in ts]})
        print(name, results[name], flush=True)

    for nm in ("576", "548"):
        if f"full_{nm}" in times and "trunk_only" in times:
            results[f"glue_{nm}_s"] = round(
                results[f"full_{nm}"]["s_median"]
                - results["trunk_only"]["s_median"]
                - results[f"tail_{nm}"]["s_median"], 4)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/hybrid_breakdown.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
