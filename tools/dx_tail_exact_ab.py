"""On-chip A/B of the two EXACT kernel reformulations targeting the
measured VPU costs (tools/out/kernel_cost_sweep.json: base 44.9 /
no-dx 56.5 / offset-0 tail 59.3 / both 71.0 TF/s):

  dx_slice   DX_MODE="slice": the +-1 horizontal-tap shifts as
             native-dtype slice+concat (Mosaic implicit relayout)
             instead of f32 dynamic rotates
  tail_wide  TAIL_WIDE_BF16: full-width act+mask in f32, ONE bf16 cast,
             THEN the gc-column tail slice (halves relayout bytes)
  both       the combination (activations never touch f32 rotates)

All are bitwise-exact vs base in interpret mode
(tests/test_pallas_rdb.py::test_dx_slice_and_wide_tail_exact); this
measures same-window TF/s and re-checks on-chip parity vs base.
Writes tools/out/dx_tail_exact_ab.json incrementally.

Usage:  nohup python tools/dx_tail_exact_ab.py > /tmp/dxtail.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

OUT = "tools/out/dx_tail_exact_ab.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()
    import innfer_tpu.ops.pallas.rdb as R

    results = {}

    def save():
        os.makedirs("tools/out", exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

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
        return (time.perf_counter() - t0) / n, y

    key = jax.random.PRNGKey(0)

    # window calibration
    n = 8192
    c0 = jax.random.normal(key, (n, n), jnp.bfloat16) * 0.01
    w = jax.random.normal(key, (n, n), jnp.bfloat16) * (1.0 / n) ** 0.5
    run = jax.jit(lambda t: lax.scan(
        lambda c, _: (jnp.dot(c, w, preferred_element_type=jnp.bfloat16),
                      None), t, None, length=20)[0])
    dt, _ = timed(run, c0)
    results["matmul_peak_tfs"] = round(2 * n ** 3 / (dt / 20) / 1e12, 1)
    print("peak", results["matmul_peak_tfs"], flush=True)
    save()

    NF, GC = 64, 32
    ws, bs = [], []
    for k in range(5):
        cin, cout = NF + k * GC, (GC if k < 4 else NF)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)
                  * 0.05)
        bs.append(jax.random.normal(k2, (cout,), jnp.float32) * 0.01)
    flops_px = 2 * 9 * sum(
        (NF + k * GC) * (GC if k < 4 else NF) for k in range(5))

    B, H, W = 8, 576, 256
    iters = 23
    key, kx = jax.random.split(key)
    xt = jax.random.normal(kx, (B, H, W, NF), jnp.bfloat16)

    variants = {
        "base": ("roll", False),
        "dx_slice": ("slice", False),
        "tail_wide": ("roll", True),
        "both": ("slice", True),
    }
    outs = {}
    for name, (dx, wide) in variants.items():
        R.DX_MODE = dx
        R.TAIL_WIDE_BF16 = wide
        try:
            t0 = time.perf_counter()
            run = jax.jit(lambda t: lax.scan(
                lambda c, _: (R.fused_rdb(
                    c, ws, bs, gc=GC, block=(64, 256), pipelined=True),
                    None), t, None, length=iters)[0])
            sync(run(xt))
            compile_s = time.perf_counter() - t0
            dt, y = timed(run, xt)
            outs[name] = y
            results[name] = {
                "tfs": round(flops_px * B * H * W / (dt / iters) / 1e12, 1),
                "compile_s": round(compile_s, 1)}
            if name != "base" and "base" in outs:
                d = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32)
                    - outs["base"].astype(jnp.float32))))
                results[name]["parity_maxabs_vs_base"] = d
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        finally:
            R.DX_MODE = "roll"
            R.TAIL_WIDE_BF16 = False
        print(name, results[name], flush=True)
        save()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
