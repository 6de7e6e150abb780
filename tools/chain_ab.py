"""Staged on-chip A/B: per-RDB fused_rdb loop vs fused_rrdb_trunk chain.

The chain mode (ops/pallas/rdb.py fused_rrdb_trunk) keeps activations in
a persistent padded layout and donates buffers between the nb*nr pallas
calls, eliminating the per-call jnp.pad + output-slice HBM glue.  A first
(polluted) probe through the whole model showed an alarming 18.3s b=8
forward — this isolates the trunk and stages up:

  stage 1: nb=2  — parity (loop vs chain) + per-RDB time for both
  stage 2: nb=23 — timing at the headline regime (b=8, 64x256 tiles)
  stage 3: nb=23 chain with pipelined=False (serial driver) — isolates
           whether the double-buffered res/out DMA bookkeeping is the
           pathology

Writes tools/out/chain_ab.json incrementally after every stage.

Usage:  nohup python tools/chain_ab.py > /tmp/chain_ab.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

OUT = "tools/out/chain_ab.json"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()
    from innfer_tpu.ops.pallas.rdb import fused_rdb, fused_rrdb_trunk

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

    rng = np.random.default_rng(0)
    nf, gc, nr = 64, 32, 3

    def make_trunk(nb):
        tws, tbs = [], []
        for _ in range(nb):
            rw, rb = [], []
            for _ in range(nr):
                ws, bs = [], []
                for c in range(5):
                    cin = nf + c * gc if c < 4 else nf + 4 * gc
                    cout = gc if c < 4 else nf
                    ws.append(jnp.asarray(
                        rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16))
                    bs.append(jnp.asarray(
                        rng.standard_normal((cout,)) * 0.01, jnp.bfloat16))
                rw.append(ws)
                rb.append(bs)
            tws.append(rw)
            tbs.append(rb)
        return tws, tbs

    def loop_trunk(x, tws, tbs, nb):
        out = x
        for r in range(nb):
            z = out
            for c in range(nr):
                z = fused_rdb(z, tws[r][c], tbs[r][c], gc=gc)
            out = (z * jnp.asarray(0.2, z.dtype) + out)
        return out

    def flops(nb, b, h, w):
        per_rdb = 2 * 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32
                           + 192 * 64)
        return nb * nr * per_rdb * b * h * w

    def timed(tag, fn, x, nb, n=4):
        try:
            t0 = time.perf_counter()
            fwd = jax.jit(fn)
            y = fwd(x)
            sync(y)
            compile_s = time.perf_counter() - t0
            feed = jax.jit(lambda t, y: t + jnp.asarray(1e-6, t.dtype)
                           * jnp.mean(y.astype(jnp.float32)).astype(t.dtype))
            t0 = time.perf_counter()
            for _ in range(n):
                x = feed(x, y)
                y = fwd(x)
            sync(y)
            dt = (time.perf_counter() - t0) / n
            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            results[tag] = {
                "ms": round(dt * 1e3, 2),
                "tfs": round(flops(nb, b, h, w) / dt / 1e12, 1),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            y = None
        print(tag, results[tag], flush=True)
        save()
        return y

    # ---- stage 1: nb=2 parity + time --------------------------------
    nb = 2
    tws, tbs = make_trunk(nb)
    x = jnp.asarray(rng.standard_normal((2, 64, 256, nf)), jnp.bfloat16)
    y_loop = timed("nb2_loop", lambda t: loop_trunk(t, tws, tbs, nb), x, nb)
    y_chain = timed(
        "nb2_chain",
        lambda t: fused_rrdb_trunk(t, tws, tbs, nb=nb, nr=nr, gc=gc),
        x, nb)
    if y_loop is not None and y_chain is not None:
        d = float(jnp.max(jnp.abs(y_loop.astype(jnp.float32)
                                  - y_chain.astype(jnp.float32))))
        results["nb2_parity_maxabs"] = d
        print("parity", d, flush=True)
        save()

    # ---- stage 2: nb=23 headline regime ------------------------------
    nb = 23
    tws, tbs = make_trunk(nb)
    x = jnp.asarray(rng.standard_normal((8, 64, 256, nf)), jnp.bfloat16)
    timed("nb23_loop_b8", lambda t: loop_trunk(t, tws, tbs, nb), x, nb)
    timed(
        "nb23_chain_b8",
        lambda t: fused_rrdb_trunk(t, tws, tbs, nb=nb, nr=nr, gc=gc),
        x, nb)

    # ---- stage 3: serial-driver chain --------------------------------
    timed(
        "nb23_chain_b8_serial",
        lambda t: fused_rrdb_trunk(t, tws, tbs, nb=nb, nr=nr, gc=gc,
                                   pipelined=False),
        x, nb)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
