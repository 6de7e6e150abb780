"""Synced backend-floor measurement for the headline config (PERF.md data).

Round-1 BASELINE.md quoted ~90-120 TF/s matmul and ~646 GB/s HBM for the
tunneled v5e — but on this platform dispatches whose outputs are never
fetched can be DROPPED (see bench.py), which inflates naive loops by the
iteration count.  This tool measures everything the honest way: each
sample chains N ops inside one jit (lax.scan) and fetches a device-computed
scalar of the result (block_until_ready is a no-op here).

Measurements:
  matmul_peak : 8192^3 bf16 matmul chain          -> TF/s (MXU ceiling)
  copy_bw     : 256 MB elementwise chain          -> GB/s (r+w streaming)
  trunk       : 69x ResidualDenseBlock_5C (the headline's conv population,
                gather formulation, tile-batch shapes) -> TF/s
  headline    : full bench.py pipeline            -> MP/s (run separately)

Usage (TPU, ~5 min):  python tools/perf_analysis.py [--json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(run, x, n=3):
        """Chain each sample's output into the next input (all samples here
        are shape-preserving) so no dispatch is droppable, and fetch the
        final scalar once."""
        y = run(x)
        sync(y)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            y = run(y)
        sync(y)
        return (time.perf_counter() - t0) / n

    results = {}
    key = jax.random.PRNGKey(0)

    # --- MXU peak: square bf16 matmul chain (AI ~2700, compute-bound) ---
    n = 8192
    c0 = jax.random.normal(key, (n, n), jnp.bfloat16) * 0.01
    w = jax.random.normal(key, (n, n), jnp.bfloat16) * (1.0 / n) ** 0.5
    steps = 20
    run = jax.jit(lambda t: lax.scan(
        lambda c, _: (jnp.dot(c, w, preferred_element_type=jnp.bfloat16), None),
        t, None, length=steps)[0])
    dt = timed(run, c0) / steps
    results["matmul_peak_tfs"] = round(2 * n ** 3 / dt / 1e12, 1)

    # --- streaming bandwidth: elementwise chain over 256 MB ---
    m = (256 << 20) // 2
    x = jax.random.normal(key, (m,), jnp.bfloat16)
    run = jax.jit(lambda t: lax.scan(
        lambda c, _: (c * jnp.asarray(1.0000001, jnp.bfloat16), None),
        t, None, length=50)[0])
    dt = timed(run, x) / 50
    results["copy_bw_gbs"] = round(2 * (256 << 20) / dt / 1e9, 1)

    # --- headline trunk population: 69 RDB5C (gather), tile-batch shapes ---
    B, H, W, NF, GC = 8, 256, 256, 64, 32
    ws, bs = [], []
    for k in range(5):
        cin, cout = NF + k * GC, (GC if k < 4 else NF)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(k2, (cout,), jnp.float32) * 0.01)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def rdb(x):
        cat = lambda *ts: jnp.concatenate(ts, axis=-1)
        lr = lambda t: jnp.where(t >= 0, t, t * 0.2)
        def cb(k, t, act):
            o = (conv(t, ws[k]) + bs[k]).astype(x.dtype)
            return lr(o) if act else o
        x1 = cb(0, x, True)
        x2 = cb(1, cat(x, x1), True)
        x3 = cb(2, cat(x, x1, x2), True)
        x4 = cb(3, cat(x, x1, x2, x3), True)
        x5 = cb(4, cat(x, x1, x2, x3, x4), False)
        return x5 * jnp.asarray(0.2, x.dtype) + x

    xt = jax.random.normal(key, (B, H, W, NF), jnp.bfloat16)
    iters = 69
    run = jax.jit(lambda t: lax.scan(
        lambda c, _: (rdb(c), None), t, None, length=iters)[0])
    dt = timed(run, xt) / iters
    flops = 2 * 9 * B * H * W * sum(
        (NF + k * GC) * (GC if k < 4 else NF) for k in range(5))
    results["trunk_xla_tfs"] = round(flops / dt / 1e12, 1)
    results["trunk_bytes_per_px_per_rdb"] = round(
        results["copy_bw_gbs"] * 1e9 * dt / (B * H * W), 1)

    # --- same trunk through the production fused Pallas RDB (64x64) ---
    if jax.default_backend() in ("tpu", "axon"):
        from innfer_tpu.ops.pallas.rdb import fused_rdb

        runp = jax.jit(lambda t: lax.scan(
            lambda c, _: (fused_rdb(c, ws, bs, gc=GC), None),
            t, None, length=iters)[0])
        dtp = timed(runp, xt) / iters
        results["trunk_pallas_tfs"] = round(flops / dtp / 1e12, 1)

    # headline speed-of-light at this peak: 1080p 4x, ~81 TFLOP/img incl.
    # tile overlap (see BASELINE.md), 33.2 out-MP/img
    sol = 33.2 / (81.0 / results["matmul_peak_tfs"])
    results["headline_sol_mps_at_peak"] = round(sol, 1)

    print(json.dumps(results, indent=None if args.json else 2))


if __name__ == "__main__":
    main()
