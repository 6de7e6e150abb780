"""Same-window END-TO-END A/B of the deconv lowering (VERDICT r3 #4).

The micro A/B (tools/deconv_ab.py) is noise-dominated: every UNet deconv
is sub-ms on this backend, where per-op timings are meaningless
(CLAUDE.md).  The decision artifact is this one: the FULL bench-config
UNet-256 forward (and CycleGAN 540p tiled) traced under BOTH lowerings
in one process (INNFER_SUBPIXEL is read at trace time), then timed in
alternating runs so every variant shares the same window.  Batch 8
(bench config) + 4 + 1 per VERDICT.

Usage (TPU): nohup python tools/subpixel_e2e_ab.py > /tmp/subpix_ab.log 2>&1 &
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

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    model, params = SP.build("unet", dtype=dtype, num_downs=8, ngf=64)
    cg_model, cg_params = SP.build("cyclegan", dtype=dtype, n_blocks=9,
                                   ngf=64)
    xcg = jnp.asarray(rng.random((1, 540, 960, 3), np.float32) * 2 - 1,
                      dtype)

    # trace each variant under its env setting (read at trace time);
    # jit caches the traced graph, so timing later is mode-independent
    variants = {}
    results = {}
    outs = {}
    for mode in ("1", "0", "all"):
        os.environ["INNFER_SUBPIXEL"] = mode
        for name, fn, arg, mp in [
            (f"unet_b8_m{mode}", jax.jit(model.apply),
             jnp.asarray(rng.random((8, 256, 256, 3), np.float32) * 2 - 1,
                         dtype), 8 * 256 * 256 / 1e6),
            (f"unet_b4_m{mode}", jax.jit(model.apply),
             jnp.asarray(rng.random((4, 256, 256, 3), np.float32) * 2 - 1,
                         dtype), 4 * 256 * 256 / 1e6),
            (f"unet_b1_m{mode}", jax.jit(model.apply),
             jnp.asarray(rng.random((1, 256, 256, 3), np.float32) * 2 - 1,
                         dtype), 256 * 256 / 1e6),
        ]:
            t0 = time.perf_counter()
            out = fn(params, arg)
            sync(out)
            variants[name] = (fn, arg, mp)
            outs[name] = np.asarray(out, np.float32)
            results[name] = {"compile_s": round(time.perf_counter() - t0, 1)}
        if mode in ("0", "all"):
            # CycleGAN's k3 deconvs only differ between "all" and not-"all"
            cg = TiledRunner(
                cg_model.apply, 1, mode="auto", tile=256, overlap=16,
                tile_batch=8, compute_dtype=dtype, tile_quantum=64)
            name = f"cg_m{mode}"
            t0 = time.perf_counter()
            out = cg(cg_params, xcg)
            sync(out)
            variants[name] = (lambda p, a, c=cg: c(p, a), xcg,
                              540 * 960 / 1e6)
            outs[name] = np.asarray(out, np.float32)
            results[name] = {"compile_s": round(time.perf_counter() - t0, 1)}
        print(mode, {k: v for k, v in results.items() if f"m{mode}" in k},
              flush=True)

    # exactness across lowerings (both are exact math; pin it end-to-end)
    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float64) - b) ** 2))
        return float("inf") if mse == 0 else 10 * np.log10(
            max(1.0, float(np.abs(b).max())) ** 2 / mse)

    results["unet_b8_parity_db"] = round(
        psnr(outs["unet_b8_m1"], outs["unet_b8_m0"]), 1)
    results["cg_parity_db"] = round(psnr(outs["cg_mall"], outs["cg_m0"]), 1)

    times = {name: [] for name in variants}
    for _ in range(5):
        for name, (fn, arg, _) in variants.items():
            t0 = time.perf_counter()
            sync(fn(params if name.startswith("unet") else cg_params, arg))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        dt = sorted(ts)[len(ts) // 2]
        mp = variants[name][2]
        results[name].update({
            "s_median": round(dt, 4), "mps": round(mp / dt, 2),
            "all_s": [round(t, 4) for t in ts]})
        print(name, results[name], flush=True)

    for b in ("b8", "b4", "b1"):
        d = results[f"unet_{b}_m0"]["s_median"]
        s = results[f"unet_{b}_m1"]["s_median"]
        results[f"unet_{b}_subpixel_speedup"] = round(d / s, 3)
    results["cg_subpixel_speedup"] = round(
        results["cg_m0"]["s_median"] / results["cg_mall"]["s_median"], 3)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/subpixel_e2e_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
