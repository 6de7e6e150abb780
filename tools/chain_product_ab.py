"""Product-path chain A/B: fused tile-through-chain vs sequential stages.

VERDICT r4 weak #6: the chain config (1x+4x ESRGAN, the bench.py `chain`
product path) had no same-window evidence that the DEFAULT fused path
(InferenceSession.build_fused_chain — one tile pass runs both stages, the
intermediate image never materializes) actually beats the reference-shaped
sequential loop (stage-by-stage, full intermediate image), nor a per-stage
breakdown, nor a measurement behind the depth-scaled fused overlap.

Rows (same window, sequential execution):
  * sequential: stage-by-stage product path (fused_chain=False), plus each
    stage timed alone (the breakdown),
  * fused_default: the product default (tile min(256,1024/scale), overlap
    scaled by chain depth),
  * fused overlap/tile variants: is the depth-scaled overlap leaving
    throughput on the table?

    nohup python tools/chain_product_ab.py > /tmp/chain_prod.log 2>&1 &

Writes tools/out/chain_product_ab.json.
"""
from __future__ import annotations

import json
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

OUT = osp.join(osp.dirname(osp.abspath(__file__)), "out",
               "chain_product_ab.json")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.checkpoint.writer import write_checkpoint
    from innfer_tpu.observability import device_sync, enable_compilation_cache
    from innfer_tpu.pipeline import InferenceSession, np2tensor
    from tools import synth_params as SP

    enable_compilation_cache()
    dtype = jnp.bfloat16
    hh, ww = 540, 960
    rng = np.random.default_rng(0)
    img = (rng.random((hh, ww, 3)) * 255).astype(np.uint8)
    x = np2tensor(img, dtype=dtype)
    chain_dep = jax.jit(
        lambda t, out: t + (out.ravel()[0] * 1e-30).astype(t.dtype))
    out_mp = hh * ww * 16 / 1e6

    tmp_ctx = tempfile.TemporaryDirectory(prefix="innfer_chain_ab_")
    c1 = osp.join(tmp_ctx.name, "1x_denoise.pth")
    c2 = osp.join(tmp_ctx.name, "4x_up.pth")
    write_checkpoint(c1, SP.esrgan_state(scale=1, nb=23, nf=64))
    write_checkpoint(c2, SP.esrgan_state(scale=4, nb=23, nf=64, seed=1))
    chain_arg = c1 + "+" + c2

    def timed(step, iters=3):
        device_sync(step(x))  # compile
        device_sync(chain_dep(x, step(x)))
        t0 = time.perf_counter()
        cur, out = x, None
        for _ in range(iters):
            out = step(cur)
            cur = chain_dep(cur, out)
        device_sync(out)
        return out_mp * iters / (time.perf_counter() - t0)

    rows = []

    def record(name, mps, **extra):
        row = {"name": name, "mps": round(mps, 3), **extra}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # sequential product path + per-stage breakdown
    seq = InferenceSession(chain_arg, compute_dtype=dtype,
                           tile_mode="auto", fused_chain=False)
    assert seq._fused_runner is None and len(seq.stages) == 2
    record("sequential_total", timed(
        lambda t: seq.stages[1](seq.stages[0](t))))
    record("stage0_1x_alone", timed(lambda t: seq.stages[0](t)))
    s1_in = seq.stages[0](x)  # fixed intermediate for the stage-1 row

    def s1_step(t):
        # time stage 1 on a same-shape input derived from t (keeps the
        # chained-dependency methodology; the 1e-30 epsilon is a runtime
        # value XLA cannot fold away, below bf16 ulp — bench.py chain_dep)
        return seq.stages[1](
            s1_in + (t.ravel()[0] * 1e-30).astype(s1_in.dtype))

    record("stage1_4x_alone", timed(s1_step))

    # fused variants
    variants = [
        ("fused_default", {}),
        ("fused_ov16", {"overlap": 16}),
        ("fused_ov48", {"overlap": 48}),
        ("fused_t192", {"tile": 192}),
    ]
    base = InferenceSession(chain_arg, compute_dtype=dtype, tile_mode="auto")
    assert base._fused_runner is not None
    dflt = base._fused_runner
    record("fused_default", timed(lambda t: dflt(None, t)),
           tile=(dflt.tile if not isinstance(dflt.tile, tuple) else
                 list(dflt.tile)), overlap=dflt.overlap)
    for name, kw in variants[1:]:
        r = base.build_fused_chain(
            tile=kw.get("tile", 256), overlap=kw.get("overlap", 32),
            tile_batch=8, mode="auto")
        record(name, timed(lambda t, rr=r: rr(None, t)),
               tile=r.tile, overlap=r.overlap)
    # repeat sequential to bound in-window drift
    record("sequential_total_again", timed(
        lambda t: seq.stages[1](seq.stages[0](t))))

    with open(OUT, "w") as f:
        json.dump({"date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                   "what": ("chain product path: fused tile-through-chain "
                            "vs sequential stages + per-stage breakdown, "
                            "1x+4x RRDB nb23 540x960 bf16, same window"),
                   "rows": rows}, f, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
