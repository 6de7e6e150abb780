"""Fused PPON _ResBlock_32 Pallas TPU kernel (EXPERIMENTAL).

STATUS (round 2): numerically exact vs XLA in interpret mode (all tests),
but the tunneled remote Mosaic compiler currently REJECTS the kernel at
real PPON widths (nf=64: the per-rate 9*64-column shifted concats at halo
9 exceed what it will schedule) for every block size tried; it compiles
and runs on-chip only for reduced widths (nf<=32), where it measured
13.3 vs XLA's 12.0 TF/s.  PPON therefore ships on the XLA path and the
backend='pallas' opt-in is for experimentation; BASELINE.md documents
PPON's remaining gap as an architecture-shape floor (32-channel conv
outputs pad 4x on the 128-lane MXU in-kernel too, so even a working
compile would win little).

The PPON trunk is 28 RRBlocks x 3 ResBlock_32 = 84 blocks of 10 small convs
each (reference PPON_arch.py:78-116): c1 (nf->nf 3x3), eight PARALLEL
dilated 3x3 convs d1..d8 (nf->nf/2, rates 1..8) over lrelu(c1(x)), cascading
prefix sums, channel concat, lrelu, a 1x1 fuse (8*gc->nf) and a 0.2
residual.  On XLA every one of those ops round-trips HBM (~3 KB/px per
block measured), which pins PPON at ~30% of the conv floor — the worst
config in BASELINE.md.  This kernel runs the whole block out of VMEM:

  * one DMA in (block + 9-pixel halo: 1 for c1 + up to 8 for d8),
    one DMA out,
  * convs as K-packed 9-tap matmuls exactly like ops/pallas/rdb.py: for
    dilation r the column taps are +-r f32 rolls and the row taps are
    +-r*wp slice+concat shifts — r*wp is always a 16-row multiple, so
    every dilation rate takes the cheap aligned path,
  * the cascade s_r = s_{r-1} + d_r accumulates in fp32; each lrelu(s_r)
    immediately multiplies its (gc, nf) slice of the 1x1 fuse weight into
    an fp32 output accumulator, so the 8*gc concat never materializes,
  * torch zero-pad semantics via masking at the global tile extent
    (same scheme as rdb.py; boundary garbage from the wrapping shifts
    stays inside the halo rings the output crop discards — the 1x1 fuse
    has no spatial taps, so d_r garbage cannot propagate inward).

Numerics: fp32 accumulation per conv and across the cascade; exact vs the
XLA path in fp32 (tests/test_pallas_resblock32.py, interpret mode).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from innfer_tpu.ops.pallas.rdb import (_canon, _pick_block, _shift_rows,
                                       _tile_valid_mask)

HALO = 9          # c1 (1) + max dilation rate (8)
LANE = 128
W_SLACK = 14      # wp = bw + 2*HALO + W_SLACK must be a 16 multiple


def _pack9(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (9*Cin, Cout), rows in (dy, dx, c) order."""
    dy, dx, ci, n = w.shape
    return w.reshape(dy * dx * ci, n)


def _resblock_kernel(
    xp_hbm, c1w, d1w, d2w, d3w, d4w, d5w, d6w, d7w, d8w, c2w,
    c1b, dbias, c2b, _out_buf, out_ref,
    x_vm, out_vm, sem, sem_out,
    *, nf: int, mc: int, gc: int, bh: int, bw: int, t_h: int, t_w: int,
    neg_slope: float,
):
    by = pl.program_id(1)
    bx = pl.program_id(2)
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK
    pp = hp * wp

    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.program_id(0), pl.ds(by * bh, hp), pl.ds(bx * bw, wp), :],
        x_vm, sem,
    )
    cp.start()
    cp.wait()

    xf = x_vm[:].reshape(pp, LANE)[:, :nf]

    valid = _tile_valid_mask(by, bx, bh=bh, bw=bw, wp=wp, pp=pp,
                             t_h=t_h, t_w=t_w, halo=HALO)

    def act_mask(pre):
        a = jnp.where(pre >= 0, pre, pre * neg_slope)
        a = jnp.where(valid, a, 0.0)
        return _canon(a, pp).astype(xf.dtype)

    def packed_conv(src, w_ref, c_in, r):
        """Dilation-r 3x3 conv as K-packed matmuls over the flat canvas.
        Wide sources (9*c_in over the ~320-column live-concat budget) split
        the dot per dy row, like rdb.py's source_contrib."""
        trio = jnp.concatenate(
            [_shift_rows(src, -r), src, _shift_rows(src, r)], axis=1
        )
        w = w_ref[:]
        if 9 * c_in > 320:
            acc = jnp.dot(_shift_rows(trio, -r * wp), w[: 3 * c_in],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(trio, w[3 * c_in: 6 * c_in],
                                preferred_element_type=jnp.float32)
            return acc + jnp.dot(_shift_rows(trio, r * wp), w[6 * c_in:],
                                 preferred_element_type=jnp.float32)
        nine = jnp.concatenate(
            [_shift_rows(trio, -r * wp), trio, _shift_rows(trio, r * wp)],
            axis=1,
        )
        return jnp.dot(nine, w, preferred_element_type=jnp.float32)

    # c1: nf -> mc, rate 1 (real PPON keeps mc == nf == 64, PPON_arch.py)
    h = act_mask(packed_conv(xf, c1w, nf, 1) + c1b[:])

    d_ws = (d1w, d2w, d3w, d4w, d5w, d6w, d7w, d8w)
    dbias_v = dbias[:]   # full ref read; only VALUES get lane-sliced below
    c2_v = c2w[:]
    s = None
    out2 = None
    for r in range(1, 9):
        d = packed_conv(h, d_ws[r - 1], mc, r)
        d = d + dbias_v[:, (r - 1) * gc: r * gc]
        s = d if s is None else s + d
        a = act_mask(s)
        p = jnp.dot(a, c2_v[(r - 1) * gc: r * gc, :],
                    preferred_element_type=jnp.float32)
        out2 = p if out2 is None else out2 + p

    out2 = out2 + c2b[:]
    out = (xf.astype(jnp.float32) + 0.2 * out2).astype(xf.dtype)
    out = jnp.concatenate(
        [out, jnp.zeros((pp, LANE - nf), out.dtype)], axis=1
    )
    out3 = out.reshape(hp, wp, LANE)
    out_vm[:] = out3[HALO: HALO + bh, HALO: HALO + bw, :]
    cpo = pltpu.make_async_copy(
        out_vm,
        out_ref.at[pl.program_id(0), pl.ds(by * bh, bh), pl.ds(bx * bw, bw), :],
        sem_out,
    )
    cpo.start()
    cpo.wait()


def fused_resblock32(
    x: jax.Array,
    c1_w: jax.Array, c1_b: jax.Array,
    d_ws: List[jax.Array], d_bs: List[jax.Array],
    c2_w: jax.Array, c2_b: jax.Array,
    *,
    block: Tuple[int, int] = (64, 64),
    neg_slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """One fused _ResBlock_32 forward.

    x: (B, th, tw, nf); c1_w HWIO (3,3,nf,mc); d_ws[r] HWIO (3,3,mc,gc)
    for rates 1..8 (real PPON: nf=mc=64, gc=32, PPON_arch.py:78-116);
    c2_w (1,1,8*gc,nf) or (8*gc,nf).  Returns x + 0.2 * fuse(cascade).
    """
    b, th, tw, nf = x.shape
    mc = int(c1_w.shape[-1])          # c1 output / d-conv input channels
    gc = int(d_ws[0].shape[-1])       # per-rate d-conv output channels
    assert len(d_ws) == 8 and len(d_bs) == 8
    assert int(np.prod(c2_w.shape[:-1])) == 8 * gc, (c2_w.shape, gc)
    bh, bw = _pick_block(th, block[0]), _pick_block(tw, block[1])
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK
    assert wp % 16 == 0, (
        f"canvas width {wp} must be a 16-row tile multiple (pick bw in 16s)"
    )

    c2 = c2_w.reshape(8 * gc, nf)
    dbias = jnp.concatenate([bb.astype(jnp.float32) for bb in d_bs])[None, :]

    xp = jnp.pad(
        x, [(0, 0), (HALO, HALO), (HALO, HALO + W_SLACK), (0, LANE - nf)]
    )
    grid = (b, th // bh, tw // bw)
    kernel = functools.partial(
        _resblock_kernel, nf=nf, mc=mc, gc=gc, bh=bh, bw=bw, t_h=th, t_w=tw,
        neg_slope=neg_slope,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [vspec] * 9 + [vspec]          # packed conv weights
        + [vspec, vspec, vspec]          # c1 bias, d biases, c2 bias
        + [pl.BlockSpec(memory_space=pltpu.HBM)],  # donated output
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((b, th, tw, LANE), x.dtype),
        input_output_aliases={14: 0},
        scratch_shapes=[
            pltpu.VMEM((hp, wp, LANE), x.dtype),
            pltpu.VMEM((bh, bw, LANE), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        _pack9(c1_w).astype(x.dtype),
        *[_pack9(wr).astype(x.dtype) for wr in d_ws],
        c2.astype(x.dtype),
        c1_b.astype(jnp.float32)[None, :],
        dbias,
        c2_b.astype(jnp.float32)[None, :],
        jnp.zeros((b, th, tw, LANE), x.dtype),
    )
    return out[..., :nf]
