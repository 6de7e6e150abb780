"""On-chip sweep: taller strip blocks for the fused RDB kernel.

Round 3's kernel_sweep found 96-row strips crashed the remote Mosaic
compiler (HTTP 500) with the OLD monolithic accumulator + wide drop-col
lane-rolls.  The reversed-suffix accumulator (commit 059ab9f) carries
much less live VPU state, so taller strips — which cut the halo-canvas
inflation, (bh+10)(bw+16)/(bh*bw): 1.229 @ 64x256, 1.173 @ 96x256,
1.146 @ 128x256 — are worth re-probing.

Per config: parity vs the shipping 64-row strip on a small input, then
same-window scan-chained timing at a production-like tile batch.
Compile failures are recorded, not fatal.

Usage:  nohup python tools/strip_height_ab.py > /tmp/strip_ab.log 2>&1 &
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

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()
    from innfer_tpu.ops.pallas.rdb import fused_rdb

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    results = {}

    # same-window context: matmul peak
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda m: (m @ m).astype(jnp.bfloat16))
    y = mm(a)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(8):
        y = mm(y)
    sync(y)
    results["peak_tfs"] = round(
        8 * 2 * 4096**3 / (time.perf_counter() - t0) / 1e12, 1)
    print("peak", results["peak_tfs"], flush=True)

    NF, GC = 64, 32
    ws, bs = [], []
    for k in range(5):
        cin, cout = NF + k * GC, (GC if k < 4 else NF)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(k2, (cout,), jnp.float32) * 0.01)
    flops_px = 2 * 9 * sum(
        (NF + k * GC) * (GC if k < 4 else NF) for k in range(5))

    # parity input: height divisible by 64, 96 and 128
    key, kx = jax.random.split(key)
    xs = jax.random.normal(kx, (1, 384, 256, NF), jnp.bfloat16)
    ref = jax.jit(lambda t: fused_rdb(t, ws, bs, gc=GC, block=(64, 256)))(xs)
    sync(ref)

    def timed(run, x, iters, n=3):
        y = run(x)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(n):
            y = run(y)
        sync(y)
        return (time.perf_counter() - t0) / n / iters

    # (bh, tile_h) pairs: tile height must be bh-divisible; production
    # plans 576-row tiles (bh 96 fits), a 128-block needs 512-row tiles
    for bh, th in ((64, 576), (96, 576), (128, 512)):
        name = f"strip_{bh}x256"
        try:
            t0 = time.perf_counter()
            out = jax.jit(lambda t, b=bh: fused_rdb(
                t, ws, bs, gc=GC, block=(b, 256)))(xs)
            d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            parity_compile_s = time.perf_counter() - t0
            key2 = jax.random.PRNGKey(1)
            xt = jax.random.normal(key2, (8, th, 256, NF), jnp.bfloat16)
            iters = 17
            t0 = time.perf_counter()
            run = jax.jit(lambda t, b=bh: lax.scan(
                lambda c, _: (fused_rdb(
                    c, ws, bs, gc=GC, block=(b, 256)), None),
                t, None, length=iters)[0])
            sync(run(xt))
            compile_s = time.perf_counter() - t0
            dt = timed(run, xt, iters)
            results[name] = {
                "parity_maxabs": d,
                "tfs": round(flops_px * 8 * th * 256 / dt / 1e12, 1),
                "compile_s": round(compile_s + parity_compile_s, 1),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(name, results[name], flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/strip_height_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
