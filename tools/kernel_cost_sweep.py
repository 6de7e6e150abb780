"""Ablation sweep: where does fused_rdb's in-kernel time go?

The production strip kernel runs ~44 TF/s useful vs a ~97 TF/s canvas-
inflation ceiling (raw matmul peak 120-137 / 1.23 inflation).  This tool
measures, in ONE time window, kernel variants with individual data-
movement components disabled (WRONG MATH — perf only):

  base         the production kernel (reversed-suffix acc, tail canon none)
  nodx         dx +-1 source shifts disabled (two f32 pltpu.roll per source)
  floor        all shifts disabled: dots + acc adds + act/mask + DMA only

(Retired arms — see tools/out/kernel_cost_sweep.json for their recorded
numbers: prefix_tail/prefix_floor isolated the lane-offset tail-slice
relayout, since recovered exactly by TAIL_WIDE_BF16; src0_pack9 measured
a net loss twice and was deleted from the kernel in round 4.)

The (base - variant) deltas rank the VPU costs.  History: the round-3
sweep of the OLD kernel (monolithic acc + wide drop-col lane-rolls)
measured base 43.3 / nodx 46.7 / nody 43.4 / nodrop 59.9 / floor 70.3
at peak 135.3 — which motivated the reversed-suffix accumulator, but the
shipped form only reached ~45: this sweep finds the residue.
Writes tools/out/kernel_cost_sweep.json.

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

    import innfer_tpu.ops.pallas.rdb as R

    orig_shift = R._shift_rows

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

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
    def shift_nodx(v, k):
        if k % 16 != 0:
            return v
        return orig_shift(v, k)

    def shift_none(v, k):
        return v

    # shift_fn per variant.  Retired arms (deleted from the kernel in
    # round 4, results recorded in tools/out/kernel_cost_sweep.json):
    # prefix_tail/prefix_floor (TAIL_SLICE ablation — the relayout cost
    # they isolated is recovered exactly by TAIL_WIDE_BF16) and
    # src0_pack9 (net loss both times measured).
    variants = {
        "base": orig_shift,
        "nodx": shift_nodx,
        "floor": shift_none,
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

    for name, shift_fn in variants.items():
        R._shift_rows = shift_fn
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
        print(name, results[name], flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/kernel_cost_sweep.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
