"""On-chip A/B: bf16 pair-packed +-1 row shifts vs the f32-roll form.

STATUS (round 3): NEGATIVE.  The packed form is bit-exact (parity 0.0)
but measured 34.7 vs 45.2 TF/s for the stock f32-roll kernel in the same
window (tools/out/dx_shift_ab.json) — the uint32 shift/or/combine ops
cost Mosaic more than the two f32 rolls they replace.  Keep the f32-roll
_shift_rows; this tool documents the probed dead end.

The fused RDB's dx +-1 source shifts cost ~3.4 TF/s (kernel_cost_sweep
nodx).  They currently cast bf16 -> f32, pltpu.roll, cast back (Mosaic's
dynamic_rotate is 32-bit only).  A bf16 (pp, c) value bitcast to int32
packs ROW PAIRS (2i, 2i+1) per 32-bit word — native bf16 sublane tiling
— so a +-1 row shift is expressible as one int32 roll of HALF the rows
plus two logical shifts and an OR (VPU elementwise, bf16-sized traffic,
no casts):

    out[2i]   = v[2i+1] = hi(v32[i])
    out[2i+1] = v[2i+2] = lo(v32[i+1])
    => out32[i] = (v32[i] >> 16) | (v32[i+1] << 16)     (k = +1)

(or the mirrored form if hi/lo map the other way — probed first).

Stage 1 probes the packing order with a tiny kernel; stage 2 times the
production fused_rdb with _shift_rows monkeypatched to the packed form,
against the stock kernel in the same window, and checks exact parity.

Usage:  nohup python tools/dx_shift_ab.py > /tmp/dx_ab.log 2>&1 &
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()
    import innfer_tpu.ops.pallas.rdb as R

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    results = {}

    # --- stage 1: probe pltpu.bitcast packing order -----------------------
    def probe_kernel(x_ref, o_ref):
        v = x_ref[:]
        v32 = pltpu.bitcast(v, jnp.uint32)
        o_ref[:] = pltpu.bitcast(v32 >> 16, jnp.bfloat16)

    x = jnp.arange(1, 17, dtype=jnp.bfloat16).reshape(16, 1)
    x = jnp.broadcast_to(x, (16, 128))
    try:
        out = pl.pallas_call(
            probe_kernel,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
        )(x)
        col = np.asarray(out[:, 0], np.float32)
        results["probe_col"] = col[:4].tolist()
        # if >>16 moved row 2i+1's bits into the LOW half of word i, then
        # after bitcast back, row 2i == original row 2i+1 and row 2i+1 == 0
        # (lo(v32) = row 2i convention) — or the mirror
        lo_is_even = bool(col[0] == 2.0 and col[1] == 0.0)
        hi_is_even = bool(col[1] == 1.0 and col[0] == 0.0)
        results["packing"] = ("lo=even" if lo_is_even
                              else "lo=odd" if hi_is_even else "unknown")
    except Exception as e:  # noqa: BLE001
        results["probe_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results["packing"] = "failed"
    print("probe:", results.get("packing"), results.get("probe_col"),
          results.get("probe_error", ""), flush=True)
    if results["packing"] not in ("lo=even", "lo=odd"):
        print(json.dumps(results))
        return

    lo_even = results["packing"] == "lo=even"

    # --- stage 2: packed _shift_rows, parity + same-window timing ---------
    orig_shift = R._shift_rows

    def packed_shift(v, k):
        if k == 0 or k % 16 == 0:
            return orig_shift(v, k)
        if v.dtype != jnp.bfloat16 or abs(k) != 1:
            return orig_shift(v, k)
        pp = v.shape[0]
        v32 = pltpu.bitcast(v, jnp.uint32)  # (pp//2, c)
        nxt = pltpu.roll(v32, (pp // 2 - 1) % (pp // 2), 0)  # v32[i+1]
        prv = pltpu.roll(v32, 1, 0)                          # v32[i-1]
        if lo_even:
            # lo(v32[i]) = row 2i, hi = row 2i+1
            if k == 1:
                out32 = (v32 >> 16) | (nxt << 16)
            else:
                out32 = (v32 << 16) | (prv >> 16)
        else:
            if k == 1:
                out32 = (v32 << 16) | (nxt >> 16)
            else:
                out32 = (v32 >> 16) | (prv << 16)
        return pltpu.bitcast(out32, jnp.bfloat16)

    key = jax.random.PRNGKey(0)
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

    def timed(run, x, n=3):
        y = run(x)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(n):
            y = run(y)
        sync(y)
        return (time.perf_counter() - t0) / n

    # parity first (single small call)
    small = xt[:1, :64, :256]
    ref = jax.jit(lambda t: R.fused_rdb(
        t, ws, bs, gc=GC, block=(64, 256)))(small)
    sync(ref)
    R._shift_rows = packed_shift
    try:
        out = jax.jit(lambda t: R.fused_rdb(
            t, ws, bs, gc=GC, block=(64, 256), pipelined=False))(small)
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        results["parity_maxabs"] = d
        print("parity packed vs stock:", d, flush=True)
    except Exception as e:  # noqa: BLE001
        results["packed_error"] = f"{type(e).__name__}: {str(e)[:400]}"
        print("packed failed:", results["packed_error"], flush=True)
        R._shift_rows = orig_shift
        print(json.dumps(results))
        return
    finally:
        R._shift_rows = orig_shift

    for name, shift in (("stock", orig_shift), ("packed", packed_shift)):
        R._shift_rows = shift
        try:
            t0 = time.perf_counter()
            run = jax.jit(lambda t: lax.scan(
                lambda c, _: (R.fused_rdb(
                    c, ws, bs, gc=GC, block=(64, 256), pipelined=True), None),
                t, None, length=iters)[0])
            sync(run(xt))
            compile_s = time.perf_counter() - t0
            dt = timed(run, xt) / iters
            results[name] = {
                "tfs": round(flops_px * B * H * W / dt / 1e12, 1),
                "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        finally:
            R._shift_rows = orig_shift
        print(name, results[name], flush=True)

    import os

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/dx_shift_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
