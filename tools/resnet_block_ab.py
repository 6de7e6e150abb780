"""A/B: fused ResnetBlock Pallas kernel vs the XLA block, on-chip.

Times a 9-block chain at the bench slab shapes, both backends, same
window; plus the full tiled CycleGAN runner with backend auto vs xla.

Usage (TPU): python tools/resnet_block_ab.py
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
    from jax import lax

    from innfer_tpu.ops.pallas.resnet_block import fused_resnet_block

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(run, x, n=5):
        y = run(x)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(n):
            y = run(y)
        sync(y)
        return (time.perf_counter() - t0) / n

    results = {}
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    C = 256
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w1 = jax.random.normal(k1, (3, 3, C, C), jnp.float32) * 0.02
    w2 = jax.random.normal(k2, (3, 3, C, C), jnp.float32) * 0.02
    b1 = jax.random.normal(k3, (C,), jnp.float32) * 0.1
    b2 = jax.random.normal(k4, (C,), jnp.float32) * 0.1

    def xla_block(t):
        def conv_in(h, w, b, relu):
            h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
            o = lax.conv_general_dilated(
                h, w.astype(h.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + b
            m = jnp.mean(o, axis=(1, 2), keepdims=True)
            d = o - m
            v = jnp.mean(d * d, axis=(1, 2), keepdims=True)
            o = d * jax.lax.rsqrt(v + 1e-5)
            if relu:
                o = jnp.maximum(o, 0.0)
            return o.astype(t.dtype)

        h = conv_in(t, w1, b1, True)
        h = conv_in(h, w2, b2, False)
        return t + h.astype(t.dtype)

    for name, (b, h, w) in (("slab_80x64", (8, 80, 64)),
                            ("slab_70x64", (8, 70, 64)),
                            ("slab_64x64", (8, 64, 64))):
        x = jnp.asarray(rng.standard_normal((b, h, w, C)), jnp.bfloat16)
        flops = 2 * 2 * 9 * C * C * b * h * w * 9
        run_x = jax.jit(lambda t: lax.scan(
            lambda c, _: (xla_block(c), None), t, None, length=9)[0])
        dt = timed(run_x, x)
        results[f"{name}_xla"] = {"ms": round(dt * 1e3, 2),
                                  "tfs": round(flops / dt / 1e12, 1)}
        print(name, "xla", results[f"{name}_xla"], flush=True)
        try:
            run_p = jax.jit(lambda t: lax.scan(
                lambda c, _: (fused_resnet_block(c, w1, b1, w2, b2), None),
                t, None, length=9)[0])
            dt = timed(run_p, x)
            results[f"{name}_pallas"] = {"ms": round(dt * 1e3, 2),
                                         "tfs": round(flops / dt / 1e12, 1)}
            print(name, "pallas", results[f"{name}_pallas"], flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_pallas"] = {"error": str(e)[:200]}
            print(name, "pallas FAILED", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
