"""Tunnel link probe: host<->device transfer rates by dtype and concurrency.

The axon backend reaches the v5e over a tunnel; BASELINE.md's e2e stage
attribution shows the device->host fetch of SR outputs dominating the
product loop.  This probe times WARM transfers (rep 0 discarded — first
use of a dtype/shape can include remote compile of the layout pass) so
the product-path dtype policy (np2tensor upload dtype, tensor2np fetch
dtype, chunked parallel fetch) is grounded in clean numbers.

Usage:  nohup python tools/link_probe.py > /tmp/link_probe.log 2>&1 &
Writes tools/out/link_probe.json.
"""
import json
import os.path as osp
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

from innfer_tpu import observability

REPS = 3
OUT = osp.join(osp.dirname(osp.abspath(__file__)), "out", "link_probe.json")


def _mb(a) -> float:
    return a.size * a.dtype.itemsize / 1e6


def time_upload(host: np.ndarray, label: str, results: dict) -> None:
    rates = []
    for rep in range(REPS + 1):
        t0 = time.perf_counter()
        x = jax.device_put(host)
        observability.device_sync(x)  # upload is async; force completion
        dt = time.perf_counter() - t0
        if rep:  # rep 0 = warmup (remote layout/compile)
            rates.append(_mb(host) / dt)
        del x
    results[label] = {"mb": round(_mb(host), 1),
                      "mb_s": [round(r, 2) for r in rates]}
    print(f"upload {label}: {results[label]}", flush=True)


def time_fetch(dev, label: str, results: dict, ways: int = 1) -> None:
    mb = dev.size * dev.dtype.itemsize / 1e6
    rates = []
    for rep in range(REPS + 1):
        # np.asarray CACHES the fetched host copy ON the array object —
        # re-fetching the same array measures a host memcpy, not the link
        # (the first committed artifact's 1-way rows read millions of
        # MB/s).  Derive a FRESH device array every rep, slice its bands
        # and sync BEFORE the clock so both paths time pure transfer
        # (device dispatch is single-stream: syncing the last slice
        # implies the earlier ones completed).
        fresh = dev + np.uint8(rep)
        if ways == 1:
            slabs = [fresh]
        else:
            h = fresh.shape[0]
            band = (h + ways - 1) // ways
            slabs = [fresh[i * band:(i + 1) * band] for i in range(ways)]
        observability.device_sync(slabs[-1])
        t0 = time.perf_counter()
        if ways == 1:
            np.asarray(slabs[0])
        else:
            with ThreadPoolExecutor(max_workers=ways) as pool:
                list(pool.map(np.asarray, slabs))
        dt = time.perf_counter() - t0
        if rep:
            rates.append(mb / dt)
        del fresh, slabs
    results[label] = {"mb": round(mb, 1), "mb_s": [round(r, 2) for r in rates]}
    print(f"fetch {label}: {results[label]}", flush=True)


def main() -> None:
    print("device:", jax.devices()[0].device_kind, flush=True)
    results = {}

    img_u8 = np.random.randint(0, 255, (1080, 1920, 3), dtype=np.uint8)
    time_upload(img_u8, "u8_6mb", results)
    time_upload(img_u8.astype(np.float32), "f32_25mb", results)
    try:
        import ml_dtypes
        time_upload(img_u8.astype(ml_dtypes.bfloat16), "bf16_12mb", results)
    except ImportError:
        pass

    # 4x SR output of a 1080p frame: (4320, 7680, 3) u8 = ~100 MB
    dev_u8 = jnp.tile(jnp.arange(7680, dtype=jnp.uint8)[None, :, None],
                      (4320, 1, 3))  # materialized ON device — no roundtrip
    observability.device_sync(dev_u8)
    time_fetch(dev_u8, "u8_100mb_1way", results)
    for ways in (2, 4, 8, 16):
        time_fetch(dev_u8, f"u8_100mb_{ways}way", results, ways=ways)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
