"""On-chip sweep of fused-RDB kernel variants (round-3 perf work).

Measures, in ONE time window (so numbers are comparable):
  - matmul peak + streaming BW (window calibration),
  - fused_rdb serial vs pipelined DMA drivers at block 64/96/128,
  - numeric agreement pipelined vs serial (the pipelined driver cannot be
    interpret-tested, so parity is checked here on the real chip).

Writes JSON to stdout and tools/out/kernel_sweep.json.

Usage:  nohup python tools/kernel_sweep.py > /tmp/sweep.log 2>&1 &
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

    from innfer_tpu.ops.pallas.rdb import fused_rdb

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

    m = (256 << 20) // 2
    x = jax.random.normal(key, (m,), jnp.bfloat16)
    run = jax.jit(lambda t: lax.scan(
        lambda c, _: (c * jnp.asarray(1.0000001, jnp.bfloat16), None),
        t, None, length=50)[0])
    dt = timed(run, x) / 50
    results["copy_bw_gbs"] = round(2 * (256 << 20) / dt / 1e9, 1)

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

    # --- numeric parity: pipelined vs serial on a multi-block grid ---
    key, kx = jax.random.split(key)
    xs = jax.random.normal(kx, (3, 128, 192, NF), jnp.bfloat16)
    a = jax.jit(lambda t: fused_rdb(t, ws, bs, gc=GC, pipelined=False))(xs)
    b = jax.jit(lambda t: fused_rdb(t, ws, bs, gc=GC, pipelined=True))(xs)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    results["pipelined_vs_serial_maxabs"] = diff
    print("parity pipelined vs serial maxabs:", diff, flush=True)

    # --- throughput sweep ---
    iters = 69
    configs = [
        ("serial_64", dict(block=(64, 64), pipelined=False), (8, 256, 256)),
        ("pipelined_64", dict(block=(64, 64), pipelined=True), (8, 256, 256)),
        # full-width strips on the real headline tile (576x256): canvas
        # inflation 1.17-1.28 vs 1.445 at 64x64 (halo rows amortize over
        # the whole strip width)
        ("strip_48x256", dict(block=(48, 256), pipelined=True), (8, 576, 256)),
        ("strip_64x256", dict(block=(64, 256), pipelined=True), (8, 576, 256)),
        ("strip_96x256", dict(block=(96, 256), pipelined=True), (8, 576, 256)),
    ]
    for name, kw, (B, H, W) in configs:
        key, kx = jax.random.split(key)
        xt = jax.random.normal(kx, (B, H, W, NF), jnp.bfloat16)
        try:
            t_compile = time.perf_counter()
            run = jax.jit(lambda t, kw=kw: lax.scan(
                lambda c, _: (fused_rdb(c, ws, bs, gc=GC, **kw), None),
                t, None, length=iters)[0])
            sync(run(xt))
            compile_s = time.perf_counter() - t_compile
            dt = timed(run, xt) / iters
            tfs = flops_px * B * H * W / dt / 1e12
            results[name] = {"tfs": round(tfs, 1),
                             "compile_s": round(compile_s, 1)}
            print(name, results[name], flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue the sweep
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(name, "FAILED", results[name], flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/kernel_sweep.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
