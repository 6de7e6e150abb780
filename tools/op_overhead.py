"""Per-op / per-pallas-call overhead floors on this backend.

CycleGAN blocks measure 7-8 TF/s for BOTH the XLA and fused-Pallas paths
(tools/resnet_block_ab.py) — ~11 ms per block against ~2 ms of matmul
work, pointing at a per-op floor rather than compute/BW limits.  This
measures that floor directly:

  * chains of N tiny vs large XLA convs -> per-op cost vs size,
  * chains of N minimal pallas calls (DMA in/out only) -> per-call cost,
  * the same conv population at 2x batch (does batching amortize it?).

Usage (TPU): nohup python tools/op_overhead.py > /tmp/overhead.log 2>&1 &
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    results = {}
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    N = 30

    # --- XLA conv chains at different spatial sizes, same channels -------
    for name, (b, h, w, c) in (
        ("conv_8x16x16x256", (8, 16, 16, 256)),
        ("conv_8x64x64x256", (8, 64, 64, 256)),
        ("conv_8x80x64x256", (8, 80, 64, 256)),
        ("conv_16x80x64x256", (16, 80, 64, 256)),
        ("conv_8x256x256x256", (8, 256, 256, 256)),
    ):
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
        wt = (jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.01
              ).astype(jnp.bfloat16)

        def step(t, _):
            o = lax.conv_general_dilated(
                t, wt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return (o * 0.25).astype(t.dtype), None

        run = jax.jit(lambda t: lax.scan(step, t, None, length=N)[0])
        dt = timed(run, x) / N
        flops = 2 * 9 * c * c * b * h * w
        results[name] = {"us_per_conv": round(dt * 1e6, 1),
                         "tfs": round(flops / dt / 1e12, 2)}
        print(name, results[name], flush=True)

    # --- minimal pallas call: DMA one buffer in and out ------------------
    def _noop_kernel(x_hbm, _buf, out_ref, x_vm, sem_i, sem_o):
        cp = pltpu.make_async_copy(x_hbm.at[0], x_vm, sem_i)
        cp.start()
        cp.wait()
        co = pltpu.make_async_copy(x_vm, out_ref.at[0], sem_o)
        co.start()
        co.wait()

    def noop_call(x):
        b, h, w, c = x.shape
        return pl.pallas_call(
            _noop_kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            input_output_aliases={1: 0},
            scratch_shapes=[pltpu.VMEM((h, w, c), x.dtype),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(x, jnp.zeros_like(x))

    for name, shape in (("pallas_noop_1x8x128x256", (1, 8, 128, 256)),
                        ("pallas_noop_1x80x64x256", (1, 80, 64, 256))):
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        run = jax.jit(lambda t: lax.scan(
            lambda c_, _: (noop_call(c_), None), t, None, length=N)[0])
        dt = timed(run, x) / N
        results[name] = {"us_per_call": round(dt * 1e6, 1)}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
