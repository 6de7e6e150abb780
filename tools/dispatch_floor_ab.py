"""Is the small-config floor per-DISPATCH or per-HOST-ROUNDTRIP?

op_overhead.py measured ~15-17 ms for ANY standalone jitted call on this
backend (even a no-op pallas kernel).  Two very different causes fit:

  (a) every executable launch costs ~15 ms through the tunnel (hard
      floor: fewer launches is the only fix), or
  (b) the launch is cheap but the host sync/fetch roundtrip costs ~15 ms
      (soft floor: chained device-side dependencies amortize it).

Distinguish by timing N=16 iterations of the same small jitted forward
three ways, same window:
  * synced     — fetch a device scalar every iteration (bench.py today),
  * chained    — each iteration's input depends on the previous output
    (y[0,0,0,0] folded in), ONE fetch at the end: drop-proof per
    CLAUDE.md but roundtrip-free,
  * chained_big — same chaining on a big (headline-chunk) forward where
    compute should dominate either way (sanity scale reference).

If chained << synced on the small op, bench.py's per-iteration sync is
charging tunnel latency to device throughput and small configs
(CycleGAN, WBC) are underreported.

Usage:  nohup python tools/dispatch_floor_ab.py > /tmp/dispatch_floor.log 2>&1 &
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
    import numpy as np

    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    rng = np.random.default_rng(0)
    results = {}
    N = 16

    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)

    @jax.jit
    def small(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def small_chained(x, prev):
        y = jax.lax.conv_general_dilated(
            x + prev[None, None, None, None].astype(x.dtype) * 1e-6, w,
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y, y[0, 0, 0, 0].astype(jnp.float32)

    x = jnp.asarray(rng.standard_normal((8, 64, 64, 64)), jnp.bfloat16)

    # warm both executables
    sync(small(x))
    _, p = small_chained(x, jnp.float32(0))
    sync(p)

    t0 = time.perf_counter()
    for _ in range(N):
        sync(small(x))
    results["small_synced_ms"] = round((time.perf_counter() - t0) / N * 1e3, 2)

    prev = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(N):
        _y, prev = small_chained(x, prev)
    sync(prev)
    results["small_chained_ms"] = round((time.perf_counter() - t0) / N * 1e3, 2)
    print(results, flush=True)

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/dispatch_floor_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
