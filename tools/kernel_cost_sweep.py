"""Ablation sweep: where does fused_rdb's in-kernel time go?

The production strip kernel runs ~44 TF/s useful vs a ~97 TF/s canvas-
inflation ceiling (raw matmul peak 120-137 / 1.23 inflation).  This tool
measures, in ONE time window, kernel variants with individual data-
movement components disabled (WRONG MATH — perf only):

  base    the production kernel
  nodx    dx +-1 source shifts disabled (the two f32 pltpu.roll per source)
  nody    dy +-wp trio shifts disabled (the tile-aligned slice+concats)
  nodrop  drop_cols lane-roll disabled (suffix accumulator shrink)
  floor   all three disabled: dots + acc adds + act/mask + DMA only

The (base - variant) deltas rank the VPU costs; `floor` is the realistic
target if shifts were free.  Writes tools/out/kernel_cost_sweep.json.

Usage:  nohup python tools/kernel_cost_sweep.py > /tmp/costsweep.log 2>&1 &
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
    from jax.experimental.pallas import tpu as real_pltpu

    import innfer_tpu.ops.pallas.rdb as R

    orig_shift = R._shift_rows

    def sync(x):
        return float(jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))(x))

    def timed(run, x, n=3):
        y = run(x)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(n):
            y = run(y)
        sync(y)
        return (time.perf_counter() - t0) / n

    results = {}
    key = jax.random.PRNGKey(0)

    # --- window calibration ---
    n = 8192
    c0 = jax.random.normal(key, (n, n), jnp.bfloat16) * 0.01
    w = jax.random.normal(key, (n, n), jnp.bfloat16) * (1.0 / n) ** 0.5
    run = jax.jit(lambda t: lax.scan(
        lambda c, _: (jnp.dot(c, w, preferred_element_type=jnp.bfloat16), None),
        t, None, length=20)[0])
    dt = timed(run, c0) / 20
    results["matmul_peak_tfs"] = round(2 * n ** 3 / dt / 1e12, 1)
    print("peak", results["matmul_peak_tfs"], flush=True)

    # --- ablation machinery ---
    class PltpuProxy:
        """pltpu with roll(axis=1) (drop_cols' lane-roll) made a no-op."""

        def __getattr__(self, name):
            return getattr(real_pltpu, name)

        @staticmethod
        def roll(v, shift, axis=0):
            if axis == 1:
                return v
            return real_pltpu.roll(v, shift, axis)

    def shift_nodx(v, k):
        if k % 16 != 0:
            return v
        return orig_shift(v, k)

    def shift_nody(v, k):
        if k != 0 and k % 16 == 0:
            return v
        return orig_shift(v, k)

    def shift_none(v, k):
        return v

    variants = {
        "base": (orig_shift, real_pltpu),
        "nodx": (shift_nodx, real_pltpu),
        "nody": (shift_nody, real_pltpu),
        "nodrop": (orig_shift, PltpuProxy()),
        "floor": (shift_none, PltpuProxy()),
    }

    # --- trunk weights ---
    NF, GC = 64, 32
    ws, bs = [], []
    for k in range(5):
        cin, cout = NF + k * GC, (GC if k < 4 else NF)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(k2, (cout,), jnp.float32) * 0.01)

    flops_px = 2 * 9 * sum(
        (NF + k * GC) * (GC if k < 4 else NF) for k in range(5))

    B, H, W = 8, 576, 256
    iters = 23
    key, kx = jax.random.split(key)
    xt = jax.random.normal(kx, (B, H, W, NF), jnp.bfloat16)

    from innfer_tpu.ops.pallas.rdb import fused_rdb

    for name, (shift_fn, pltpu_mod) in variants.items():
        R._shift_rows = shift_fn
        R.pltpu = pltpu_mod
        try:
            t_compile = time.perf_counter()
            run = jax.jit(lambda t: lax.scan(
                lambda c, _: (fused_rdb(
                    c, ws, bs, gc=GC, block=(64, 256), pipelined=True), None),
                t, None, length=iters)[0])
            sync(run(xt))
            compile_s = time.perf_counter() - t_compile
            dt = timed(run, xt) / iters
            tfs = flops_px * B * H * W / dt / 1e12
            results[name] = {"tfs": round(tfs, 1),
                             "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 - record and continue
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:250]}"}
        finally:
            R._shift_rows = orig_shift
            R.pltpu = real_pltpu
        print(name, results[name], flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/kernel_cost_sweep.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
