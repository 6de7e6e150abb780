"""On-chip Pallas parity artifact (ONCHIP_r{N}.json).

Interpret-mode tests (tests/test_pallas_rdb.py) validate kernel math on
CPU, but this backend's Mosaic quirks — layout canonicalization, DMA
alignment, the output-aliasing path (ops/pallas/rdb.py) — are exactly the
class of bug interpret mode cannot see.  This tool runs the PRODUCTION
path on the real chip and records the evidence the test suite can't:

  * kernel-level: fused_rdb (serial + pipelined drivers) vs the XLA conv
    chain on one tile batch -> max|diff| and PSNR,
  * end-to-end: the full bf16 tiled 4x RRDB forward with backend='auto'
    (fused Pallas trunk) vs backend='xla' -> PSNR + both throughputs.

Regenerate each round:
  nohup python tools/on_chip_parity.py --out ONCHIP_r03.json > /tmp/parity.log 2>&1 &
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ONCHIP_r03.json")
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()

    from innfer_tpu.models import get_network
    from innfer_tpu.ops.pallas.rdb import fused_rdb
    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    assert jax.default_backend() in ("tpu", "axon"), (
        "on-chip parity must run on the real TPU backend")

    def sync(x):
        return float(jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))(x))

    def psnr(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        mse = np.mean((a - b) ** 2)
        rng = max(1.0, np.abs(b).max())
        return float("inf") if mse == 0 else 10 * np.log10(rng * rng / mse)

    results = {"backend": jax.default_backend(),
               "jax": jax.__version__}
    rng = np.random.default_rng(7)

    # --- kernel level -----------------------------------------------------
    NF, GC = 64, 32
    ws, bs = [], []
    key = jax.random.PRNGKey(0)
    for k in range(5):
        cin, cout = NF + k * GC, (GC if k < 4 else NF)
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(k2, (cout,), jnp.float32) * 0.01)

    xt = jnp.asarray(rng.random((4, 128, 192, NF), np.float32), jnp.bfloat16)

    def xla_rdb(x):
        cat = lambda *ts: jnp.concatenate(ts, axis=-1)
        lr = lambda t: jnp.where(t >= 0, t, t * 0.2)

        def cb(k, t, act):
            o = (lax.conv_general_dilated(
                t, ws[k].astype(t.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + bs[k]).astype(x.dtype)
            return lr(o) if act else o

        x1 = cb(0, x, True)
        x2 = cb(1, cat(x, x1), True)
        x3 = cb(2, cat(x, x1, x2), True)
        x4 = cb(3, cat(x, x1, x2, x3), True)
        x5 = cb(4, cat(x, x1, x2, x3, x4), False)
        return x5 * jnp.asarray(0.2, x.dtype) + x

    ref = np.asarray(jax.jit(xla_rdb)(xt), np.float32)
    for name, pipelined in (("serial", False), ("pipelined", True)):
        got = np.asarray(jax.jit(
            lambda t, p=pipelined: fused_rdb(t, ws, bs, gc=GC, pipelined=p)
        )(xt), np.float32)
        results[f"kernel_{name}_vs_xla_maxabs"] = float(
            np.abs(got - ref).max())
        results[f"kernel_{name}_vs_xla_psnr_db"] = round(psnr(got, ref), 1)
    print("kernel:", {k: v for k, v in results.items() if "kernel" in k},
          flush=True)

    # --- end to end -------------------------------------------------------
    H, W = args.height, args.width
    dtype = jnp.bfloat16
    model, params = SP.build("esrgan", scale=4, dtype=dtype, nb=23, nf=64)
    x = jnp.asarray(rng.random((1, H, W, 3), np.float32), dtype)

    outs, times = {}, {}
    for backend in ("auto", "xla"):
        m = get_network(dict(model.cfg, backend=backend))
        # force the SAME tile plan for both backends (tile_quantum=64) so
        # the PSNR isolates kernel numerics, not seam-placement differences
        runner = TiledRunner(
            m.apply, 4, mode="auto", tile=256, overlap=16, tile_batch=8,
            compute_dtype=dtype, max_group_px=1_400_000,
            tile_quantum=64)
        sync(runner(params, x))  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            out = runner(params, x)
            sync(out)
        times[backend] = (time.perf_counter() - t0) / 3
        outs[backend] = np.asarray(out, np.float32)
        results[f"e2e_{backend}_mps"] = round(
            H * W * 16 / times[backend] / 1e6, 2)
    results["e2e_auto_vs_xla_psnr_db"] = round(
        psnr(outs["auto"], outs["xla"]), 1)
    print("e2e:", {k: v for k, v in results.items() if "e2e" in k},
          flush=True)

    # --- CycleGAN fused ResnetBlock (ops/pallas/resnet_block.py) ----------
    cg_model, cg_params = SP.build("cyclegan", dtype=dtype, n_blocks=9,
                                   ngf=64)
    xcg = jnp.asarray(rng.random((1, 512, 512, 3), np.float32) * 2 - 1,
                      dtype)
    cg_outs, cg_times = {}, {}
    for backend in ("pallas", "xla"):
        m = get_network(dict(cg_model.cfg, backend=backend))
        runner = TiledRunner(
            m.apply, 1, mode="auto", tile=256, overlap=16, tile_batch=8,
            compute_dtype=dtype, max_group_px=1_400_000, tile_quantum=64)
        sync(runner(cg_params, xcg))
        t0 = time.perf_counter()
        for _ in range(3):
            out = runner(cg_params, xcg)
            sync(out)
        cg_times[backend] = (time.perf_counter() - t0) / 3
        cg_outs[backend] = np.asarray(out, np.float32)
        results[f"cg_{backend}_mps"] = round(
            512 * 512 / cg_times[backend] / 1e6, 2)
    results["cg_pallas_vs_xla_psnr_db"] = round(
        psnr(cg_outs["pallas"], cg_outs["xla"]), 1)
    print("cyclegan:", {k: v for k, v in results.items() if "cg_" in k},
          flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
