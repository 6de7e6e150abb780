"""Fused CycleGAN ResnetBlock Pallas TPU kernel.

One residual block (reference ResNet_arch.py build_conv_block, library
default config) is

    x + IN(conv3x3(relu(IN(conv3x3(reflect_pad(x)))) reflect_pad))

at 4*ngf (=256) channels on the 1/4-resolution slab of each tile.  The
XLA path materializes per block: two reflect-pad copies, two conv
outputs, and four full instance-norm passes (stats + normalize per conv)
— ~10 HBM passes over the activation per block.  This kernel keeps the
whole block in VMEM: the slab is DMA'd in once per block, both convs run
as K-packed matmuls (K = 9*256 split per vertical tap), instance-norm
stats are VMEM-resident column reductions, and only the residual output
returns to HBM.

Unlike the RDB kernel (halo + masking), the reflect padding here is a
PER-TILE semantic: the pad happens at the slab's own boundary, so each
slab is independent — no halo, no inter-block masking.  Reflect edges are
reproduced with shifted values plus row/column edge selects.

Constraints inherited from this backend's Mosaic (see rdb.py / CLAUDE.md):
channels already 256 = 2*128 lanes (no padding needed), slab width must
be a multiple of 16 so vertical shifts stay tile-aligned in bf16, rolls
for the +-1 horizontal taps run in f32 (no bf16 rotate).

Instance norm matches nn.functional.instance_norm: biased variance over
the slab, eps 1e-5, no affine (CycleGAN InstanceNorm2d affine=False),
stats in fp32.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _shift1(v: jax.Array, k: int) -> jax.Array:
    """out[i] = v[i+k] via f32 roll (|k| small, not sublane-aligned)."""
    rolled = pltpu.roll(v.astype(jnp.float32), (-k) % v.shape[0], 0)
    return rolled.astype(v.dtype)


def _shiftw(v: jax.Array, k: int) -> jax.Array:
    """out[i] = v[i+k] for |k| a 16-row multiple: tile-aligned slice+concat
    (zeros shifted in; callers overwrite edge rows via selects)."""
    if k == 0:
        return v
    z = jnp.zeros((abs(k), v.shape[1]), v.dtype)
    if k > 0:
        return jnp.concatenate([v[k:], z], axis=0)
    return jnp.concatenate([z, v[:k]], axis=0)


def _resnet_block_compute(
    x, w1, w2, b1, b2, rowid, colid, *, h: int, w: int, eps: float,
):
    """x: (pp, 256) bf16 slab -> (pp, 256) bf16 residual output."""
    pp = x.shape[0]

    def reflect_taps(src):
        """dx in {-1, 0, +1} columns of the reflect-padded slab, as a
        (pp, 3*C) concat; then dy in {-1, 0, +1} handled by the caller.

        Reflect semantics: col -1 == col 1, col w == col w-2
        (torch ReflectionPad2d)."""
        left = _shift1(src, -1)    # reads col j-1
        right = _shift1(src, 1)    # reads col j+1
        # at col 0 the dx=-1 tap must read col 1 (the dx=+1 value);
        # at col w-1 the dx=+1 tap must read col w-2
        lfix = jnp.where(colid == 0, right, left)
        rfix = jnp.where(colid == w - 1, left, right)
        return jnp.concatenate([lfix, src, rfix], axis=1)

    def conv_in_block(src, wt, bias, relu):
        trio = reflect_taps(src)           # (pp, 3C)
        up0 = _shiftw(trio, -w)            # reads row i-1
        dn0 = _shiftw(trio, w)             # reads row i+1
        # row 0: dy=-1 must read row 1; row h-1: dy=+1 must read row h-2
        up = jnp.where(rowid == 0, dn0, up0)
        dn = jnp.where(rowid == h - 1, up0, dn0)
        acc = jnp.dot(up, wt[0], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(trio, wt[1], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(dn, wt[2], preferred_element_type=jnp.float32)
        acc = acc + bias[:]
        # instance norm (biased variance, no affine, fp32 stats)
        m = jnp.mean(acc, axis=0, keepdims=True)
        d = acc - m
        v = jnp.mean(d * d, axis=0, keepdims=True)
        out = d * jax.lax.rsqrt(v + eps)
        if relu:
            out = jnp.maximum(out, 0.0)
        return out.astype(src.dtype)

    h1 = conv_in_block(x, w1, b1, relu=True)
    h2 = conv_in_block(h1, w2, b2, relu=False)
    return (x.astype(jnp.float32) + h2.astype(jnp.float32)).astype(x.dtype)


def _rb_kernel(
    x_hbm, w1a, w1b, w1c, w2a, w2b, w2c, b1, b2, _buf, out_ref,
    x_vm, out_vm, sem_in, sem_out,
    *, h: int, w: int, eps: float, total: int,
):
    """Double-buffered driver over the batch grid (one slab per step)."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    def in_copy(j, slot_j):
        return pltpu.make_async_copy(
            x_hbm.at[j], x_vm.at[slot_j], sem_in.at[slot_j])

    def out_copy(j, slot_j):
        return pltpu.make_async_copy(
            out_vm.at[slot_j], out_ref.at[j], sem_out.at[slot_j])

    @pl.when(i == 0)
    def _():
        in_copy(i, slot).start()

    @pl.when(i + 1 < total)
    def _():
        in_copy(i + 1, jax.lax.rem(i + 1, 2)).start()

    in_copy(i, slot).wait()

    pp = h * w
    x = x_vm[slot].reshape(pp, 2 * LANE)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0) // w
    colid = jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0) % w
    out = _resnet_block_compute(
        x, (w1a[:], w1b[:], w1c[:]), (w2a[:], w2b[:], w2c[:]), b1, b2,
        rowid, colid, h=h, w=w, eps=eps)

    @pl.when(i >= 2)
    def _():
        out_copy(i - 2, slot).wait()

    out_vm[slot] = out.reshape(h, w, 2 * LANE)
    out_copy(i, slot).start()

    @pl.when(i == total - 1)
    def _():
        out_copy(i, slot).wait()

    if total >= 2:
        @pl.when(i == total - 1)
        def _():
            out_copy(i - 1, jax.lax.rem(i - 1, 2)).wait()


def _pack(wt: jax.Array):
    """HWIO (3,3,C,C) -> three (3C, C) K-packed mats, one per vertical tap,
    rows ordered (dx, c) to match the kernel's [left, mid, right] concat."""
    c = wt.shape[2]
    per_dy = []
    for dy in range(3):
        mats = [wt[dy, dx].reshape(c, c) for dx in range(3)]
        per_dy.append(jnp.concatenate(mats, axis=0))  # (3C, C)
    return per_dy


def fused_resnet_block(
    x: jax.Array,
    w1: jax.Array, b1: Optional[jax.Array],
    w2: jax.Array, b2: Optional[jax.Array],
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """One fused CycleGAN residual block.

    x: (B, H, W, 256); w1/w2: HWIO (3, 3, 256, 256); b1/b2: (256,) or None.
    Requires C == 256 (2 full lanes) and W % 16 == 0 (tile-aligned row
    shifts); callers gate via :func:`slab_ok`.
    """
    b, h, w, c = x.shape
    if c != 2 * LANE:
        raise ValueError(f"fused_resnet_block requires 256 channels, got {c}")
    if w % 16 != 0 or h < 2 or w < 16:
        raise ValueError(f"slab width must be a 16-multiple >=16, got {w}")

    w1p = _pack(w1.astype(x.dtype))
    w2p = _pack(w2.astype(x.dtype))
    zero = jnp.zeros((1, c), jnp.float32)
    b1v = zero if b1 is None else b1.astype(jnp.float32)[None]
    b2v = zero if b2 is None else b2.astype(jnp.float32)[None]

    kernel = functools.partial(_rb_kernel, h=h, w=w, eps=eps, total=b)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        + [pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        input_output_aliases={9: 0},
        scratch_shapes=[
            pltpu.VMEM((2, h, w, c), x.dtype),
            pltpu.VMEM((2, h, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w1p[0], w1p[1], w1p[2], w2p[0], w2p[1], w2p[2], b1v, b2v,
      jnp.zeros((b, h, w, c), x.dtype))


def slab_ok(shape: Tuple[int, ...], dtype) -> bool:
    """Gate for the auto backend: bf16 NHWC slabs, 256 channels, width a
    16-multiple, and a VMEM-safe slab size (trio concat (pp, 768) bf16
    stays under ~13 MB)."""
    if len(shape) != 4 or shape[3] != 2 * LANE:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    b, h, w, _ = shape
    return h >= 2 and w >= 16 and w % 16 == 0 and h * w <= 8192
