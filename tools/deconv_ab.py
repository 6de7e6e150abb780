"""A/B: input-dilated vs subpixel lowering for ConvTranspose2d shapes.

The k4s2p1 subpixel rewrite regressed the UNet bench (16-18 -> 10.4 MP/s)
— time both lowerings at every UNet-256 and CycleGAN deconv shape to find
where each wins, then gate the fast path accordingly.

Usage (TPU): nohup python tools/deconv_ab.py > /tmp/deconv_ab.log 2>&1 &
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

    import innfer_tpu.nn.functional as F

    def sync(x):
        return float(jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))(x))

    def timed(fn, *a, n=10):
        y = fn(*a)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(*a)
            sync(y)
        return (time.perf_counter() - t0) / n

    rng = np.random.default_rng(0)
    results = {}
    # (name, B, H, W, Cin, Cout, k, op) — UNet-256 decoder (k4 op0) at
    # batch 8 and CycleGAN ups (k3 op1) at tile 320x256 slabs
    shapes = [
        ("unet_inner_2", 8, 2, 2, 1024, 512, 4, 0),
        ("unet_4", 8, 4, 4, 1024, 512, 4, 0),
        ("unet_8", 8, 8, 8, 1024, 512, 4, 0),
        ("unet_16", 8, 16, 16, 1024, 512, 4, 0),
        ("unet_32", 8, 32, 32, 1024, 256, 4, 0),
        ("unet_64", 8, 64, 64, 512, 128, 4, 0),
        ("unet_128", 8, 128, 128, 256, 64, 4, 0),
        ("unet_outer_256", 8, 128, 128, 128, 64, 4, 0),
        ("cg_up1", 8, 80, 64, 256, 128, 3, 1),
        ("cg_up2", 8, 160, 128, 128, 64, 3, 1),
    ]
    for name, b, h, w, ci, co, k, op in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.05,
                         jnp.bfloat16)
        bb = jnp.asarray(rng.standard_normal((co,)), jnp.float32)

        pads = [(k - 1 - 1, k - 1 - 1 + op)] * 2

        @jax.jit
        def dilated(t, wt=wt, bb=bb, pads=pads):
            o = lax.conv_general_dilated(
                t, wt, (1, 1), pads, lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + bb
            return o.astype(t.dtype)

        if k == 4:
            sub = jax.jit(lambda t, wt=wt, bb=bb:
                          F._conv_transpose_subpixel_k4s2p1(t, wt, bb))
        else:
            sub = jax.jit(lambda t, wt=wt, bb=bb:
                          F._conv_transpose_subpixel_k3s2p1op1(t, wt, bb))
        td = timed(dilated, x)
        ts = timed(sub, x)
        results[name] = {"dilated_us": round(td * 1e6, 1),
                         "subpixel_us": round(ts * 1e6, 1),
                         "subpixel_speedup": round(td / ts, 2)}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
