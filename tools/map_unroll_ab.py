"""Is lax.map-over-groups the fused-ResnetBlock tiled-graph pathology?

The fused block matches XLA standalone but ran ~9x slower inside the
tiled runner at tile 192 (9 tiles -> 2 lax.map groups).  This times the
SAME tiled computation with (a) lax.map over groups (engine as-built)
vs (b) a Python-unrolled group loop, for backend pallas and xla, plus
the ESRGAN headline runner both ways.

Usage (TPU): nohup python tools/map_unroll_ab.py > /tmp/unroll.log 2>&1 &
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.models import get_network
    from innfer_tpu.tiling.engine import TiledRunner
    from tools import synth_params as SP

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(fn, n=3):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn())
        return (time.perf_counter() - t0) / n

    results = {}
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    # The engine's _UNROLL_GROUPS hook was DELETED (2026-08-19) on this
    # tool's artifact: map won both backends (cg t192 pallas 40.6 vs 45.4,
    # xla 41.4 vs 43.5 ms).  To re-reproduce, "unroll" mode now swaps
    # jax.lax.map for a Python-unrolled stack at trace time.
    real_map = jax.lax.map

    def unrolled_map(f, xs):
        return jnp.stack([f(xs[i]) for i in range(xs.shape[0])])

    def run_config(tag, model, params, scale, x, tile, quantum):
        for mode in ("map", "unroll"):
            jax.lax.map = unrolled_map if mode == "unroll" else real_map
            runner = TiledRunner(model.apply, scale, mode="uniform",
                                 tile=tile, overlap=16, tile_batch=8,
                                 compute_dtype=dtype, tile_quantum=quantum)
            try:
                dt = timed(lambda: runner(params, x))
                results[f"{tag}_{mode}"] = {"ms": round(dt * 1e3, 1)}
            except Exception as e:  # noqa: BLE001
                results[f"{tag}_{mode}"] = {"error": str(e)[:150]}
            finally:
                jax.lax.map = real_map
            print(tag, mode, results[f"{tag}_{mode}"], flush=True)

    cg, cgp = SP.build("cyclegan", dtype=dtype, n_blocks=9, ngf=64)
    xcg = jnp.asarray(rng.random((1, 512, 512, 3), np.float32) * 2 - 1, dtype)
    run_config("cg_pallas_t192", get_network(dict(cg.cfg, backend="pallas")),
               cgp, 1, xcg, 192, 64)
    run_config("cg_xla_t192", get_network(dict(cg.cfg, backend="xla")),
               cgp, 1, xcg, 192, 1)

    esr, esrp = SP.build("esrgan", scale=4, dtype=dtype, nb=23, nf=64)
    xe = jnp.asarray(rng.random((1, 540, 960, 3), np.float32), dtype)
    run_config("esrgan_t320", esr, esrp, 4, xe, 320, 64)

    import os

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/map_unroll_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
