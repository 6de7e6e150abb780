"""A/B: input-dilated vs subpixel lowering for ConvTranspose2d shapes.

The k4s2p1 subpixel rewrite regressed the UNet bench (16-18 -> 10.4 MP/s);
time both lowerings at every UNet-256 / CycleGAN deconv shape to find
where each wins, then gate the fast path accordingly.

Methodology: each sample is ONE jit of a 20-step lax.scan whose step runs
the deconv and restores the carry shape (stride-2 slice + channel tile);
a glue-only scan (same step without the deconv) is subtracted.  One
device-scalar fetch per sample (unsynced dispatches can be dropped here).

Usage (TPU): nohup python tools/deconv_ab.py > /tmp/deconv_ab.log 2>&1 &
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

STEPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import innfer_tpu.nn.functional as F

    def sync(x):
        # ONE persistent jitted checksum (observability.device_sync): a
        # fresh jax.jit per call costs ~0.47 s on this tunneled backend
        # (vs 0.03 s; measured round 4) and was silently inflating every
        # timed sample in these tools.
        from innfer_tpu.observability import device_sync

        device_sync(x)

    def timed(run, x, n=4):
        sync(run(x))
        t0 = time.perf_counter()
        for _ in range(n):
            sync(run(x))
        return (time.perf_counter() - t0) / n

    rng = np.random.default_rng(0)
    results = {}
    # batch 1/4/8 on the FLOP-dominant UNet shapes (the decision must hold
    # across batch sizes, VERDICT r3 #4); small shapes at batch 8 only
    # (they are per-op-floor-bound, batch hardly moves them)
    shapes = [
        ("unet_inner_2", 8, 2, 2, 1024, 512, 4, 0),
        ("unet_4", 8, 4, 4, 1024, 512, 4, 0),
        ("unet_8", 8, 8, 8, 1024, 512, 4, 0),
        ("unet_16", 8, 16, 16, 1024, 512, 4, 0),
        ("unet_32", 8, 32, 32, 1024, 256, 4, 0),
        ("unet_64", 8, 64, 64, 512, 128, 4, 0),
        ("unet_64_b4", 4, 64, 64, 512, 128, 4, 0),
        ("unet_64_b1", 1, 64, 64, 512, 128, 4, 0),
        ("unet_128", 8, 128, 128, 256, 64, 4, 0),
        ("unet_128_b4", 4, 128, 128, 256, 64, 4, 0),
        ("unet_128_b1", 1, 128, 128, 256, 64, 4, 0),
        ("cg_up1", 8, 80, 64, 256, 128, 3, 1),
        ("cg_up2", 8, 160, 128, 128, 64, 3, 1),
        ("cg_up2_b1", 1, 160, 128, 128, 64, 3, 1),
    ]
    for name, b, h, w, ci, co, k, op in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.05,
                         jnp.bfloat16)
        bb = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        pads = [(k - 2, k - 2 + op)] * 2
        rep = -(-ci // co)

        def restore(o):
            c2 = o[:, ::2, ::2, :]
            return jnp.tile(c2, (1, 1, 1, rep))[..., :ci]

        def step_dilated(c, _):
            o = (lax.conv_general_dilated(
                c, wt, (1, 1), pads, lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + bb).astype(c.dtype)
            return restore(o), None

        if k == 4:
            def step_sub(c, _):
                return restore(
                    F._conv_transpose_subpixel_k4s2p1(c, wt, bb)), None
        else:
            def step_sub(c, _):
                return restore(
                    F._conv_transpose_subpixel_k3s2p1op1(c, wt, bb)), None

        def step_glue(c, _):
            o = jnp.tile(c[..., :co], (1, 2, 2, 1))  # same out shape class
            return restore(o), None

        times = {}
        for label, step in (("dilated", step_dilated), ("subpixel", step_sub),
                            ("glue", step_glue)):
            run = jax.jit(lambda t, s=step: lax.scan(s, t, None,
                                                     length=STEPS)[0])
            times[label] = timed(run, x) / STEPS
        d = max(times["dilated"] - times["glue"], 1e-9)
        s = max(times["subpixel"] - times["glue"], 1e-9)
        results[name] = {"dilated_us": round(d * 1e6, 1),
                         "subpixel_us": round(s * 1e6, 1),
                         "subpixel_speedup": round(d / s, 2)}
        print(name, results[name], flush=True)
    import os

    os.makedirs("tools/out", exist_ok=True)
    with open("tools/out/deconv_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
