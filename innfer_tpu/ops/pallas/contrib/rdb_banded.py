"""Banded fused Residual Dense Block kernel (experimental).

STATUS (round 1): numerically exact (interpret + on-chip), but on the
current tunneled backend Mosaic emits ~150us-floor code per band iteration
regardless of matmul size (measured via dots-only diagnostics), so this
runs at ~7 TF/s vs XLA's ~24 TF/s conv path.  Kept as the
architecturally-correct design for when the backend's in-kernel matmul /
ref-RMW performance improves.

Same math as ops/pallas/rdb.py (scatter-wide, K-packed 9-tap matmuls, torch
zero-pad semantics via masking) but engineered around the backend's VMEM
rules discovered empirically (see memory notes / CLAUDE.md):

  * pallas outputs and live VALUES share a ~20MB VMEM stack, while SCRATCH
    buffers have a larger pool with a ~16MB per-buffer cap;
  * therefore all large state lives in scratch refs — the input window, a
    single (canvas, 192) pre-activation accumulator, ONE recycled source
    buffer (scatter-wide consumes each source immediately), and an output
    staging block — and compute sweeps the canvas in small ROW BANDS whose
    values stay ~2-4MB;
  * refs are never lane-sliced (banned); band values are lane-sliced in
    f32 and immediately re-canonicalized with a net-zero rotate before any
    concat/roll/store (offset layouts break those ops).

Each (by, bx) grid block processes a bh x bw output region with a 5-pixel
halo.  Per source s (x, x1..x4): an activation sweep materializes the
source band-by-band from the accumulator, then a contribution sweep does
one K-packed matmul per band into the accumulator columns of all later
targets.  H-dim ref offsets are unconstrained (untiled), which is what
makes row banding cheap.

ESRGAN+ 'plus' checkpoints use the non-banded kernel (rdb.py) — the
recycled source buffer cannot keep x2 alive until stage 4.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5
LANE = 128


def _pack_source_weights(weights, nf: int, gc: int):
    """Per-source K-packed 9-tap weights in FORWARD target order
    [x_{s+1} | ... | x5] (this shelved kernel's accumulator slices assume
    it; the production rdb.py switched to reversed packing round 3)."""
    packed = []
    for s in range(5):
        c_s = nf if s == 0 else gc
        lo = 0 if s == 0 else nf + (s - 1) * gc
        parts = [weights[c - 1][:, :, lo: lo + c_s, :]
                 for c in range(s + 1, 6)]
        cat = jnp.concatenate(parts, axis=-1)          # (3, 3, C_s, N_s)
        dy, dx, ci, n = cat.shape
        packed.append(cat.reshape(dy * dx * ci, n))
    return packed


def _roll(v: jax.Array, k: int) -> jax.Array:
    """out[i] = v[i + k] as a 32-bit circular roll (wrap garbage is absorbed
    by the halo rings, see rdb.py)."""
    if k == 0:
        return v
    assert v.dtype == jnp.float32
    return pltpu.roll(v, (-k) % v.shape[0], 0)


def _canon(v: jax.Array) -> jax.Array:
    """Force a canonical (offset-0) layout via a net-zero double rotate."""
    return pltpu.roll(pltpu.roll(v, 8, 0), v.shape[0] - 8, 0)


def _banded_kernel(
    xp_hbm, wt0, wt1, wt2, wt3, wt4, bias, out_ref,
    x_vm, xs, acc, out_vm, sem, sem_out,
    *, nf: int, gc: int, bh: int, bw: int, t_h: int, t_w: int,
    band: int, n_bands: int, neg_slope: float,
):
    by = pl.program_id(1)
    bx = pl.program_id(2)
    hp = bh + 2 * HALO
    wp = x_vm.shape[1]
    rows_total = x_vm.shape[0]
    n_total = 4 * gc + nf
    f32 = jnp.float32
    cdt = x_vm.dtype

    # ---- load the input window (rows [1, 1+hp) of the margined canvas) ----
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.program_id(0), pl.ds(by * bh, hp), pl.ds(bx * bw, wp), :],
        x_vm.at[pl.ds(1, hp)], sem,
    )
    cp.start()
    zrow = jnp.zeros((1, wp, LANE), cdt)
    x_vm[0:1] = zrow
    for r in range(1 + hp, rows_total):
        x_vm[r: r + 1] = zrow
    xs[0:1] = zrow
    xs[rows_total - 1: rows_total] = zrow
    acc[:, :, :] = jnp.broadcast_to(
        bias[:].astype(acc.dtype), (rows_total, wp, n_total))
    cp.wait()

    def band_mask(i: int):
        """(band*wp, 1) bool: inside the true tile (per-conv zero-pad law)."""
        fl = jax.lax.broadcasted_iota(jnp.int32, (band * wp, 1), 0)
        canvas_row = i * band + fl // wp
        canvas_col = fl % wp
        g_row = by * bh + canvas_row
        g_col = bx * bw + canvas_col
        return ((g_row >= HALO) & (g_row < HALO + t_h)
                & (g_col >= HALO) & (g_col < HALO + t_w))

    def _shift_tile(v, k):
        """out[i] = v[i+k] for |k| a 16-row multiple: aligned slice+concat
        (zero fill lands in the band margins, like roll wrap)."""
        z = jnp.zeros((abs(k), v.shape[1]), v.dtype)
        if k > 0:
            return jnp.concatenate([v[k:], z], axis=0)
        return jnp.concatenate([z, v[:k]], axis=0)

    def contribute(src_ref, c_s, wt_ref, col0):
        """One sweep: per band, a nine-tap K-packed matmul into acc.

        Sources live at lanes [0, c_s) of their buffer, so the lane slice is
        offset-0 (no relayout); the dx +-1 shifts are the ONLY rotates and
        the dy +-wp shifts are tile-aligned concats (wp is a 16-multiple)."""
        w = wt_ref[:]
        for i in range(n_bands):
            # canvas rows [i*band - 1, i*band + band + 1) = ref rows
            # [i*band, i*band + band + 2)  (margin offset +1)
            raw = src_ref[i * band: i * band + band + 2]
            flat = raw.reshape((band + 2) * wp, LANE).astype(f32)[:, :c_s]
            trio = jnp.concatenate(
                [_roll(flat, -1), flat, _roll(flat, 1)], axis=1)
            nine = jnp.concatenate(
                [_shift_tile(trio, -wp), trio, _shift_tile(trio, wp)], axis=1
            ).astype(cdt)
            contrib = jnp.dot(nine[wp: wp + band * wp], w,
                              preferred_element_type=f32)
            if col0:
                contrib = jnp.concatenate(
                    [jnp.zeros((band * wp, col0), f32), contrib], axis=1)
            upd = contrib.reshape(band, wp, n_total).astype(acc.dtype)
            r0 = 1 + i * band
            acc[r0: r0 + band] = acc[r0: r0 + band] + upd

    def activate(s: int):
        """xs <- masked lrelu(acc cols of x_s), stored in x_s's lane block."""
        col0 = (s - 1) * gc
        for i in range(n_bands):
            r0 = 1 + i * band
            a = acc[r0: r0 + band].astype(f32).reshape(band * wp, n_total)
            pre = a[:, col0: col0 + gc]
            if col0 % LANE:
                pre = _canon(pre)  # col0 slices at 32/64/96 need relayout
            v = jnp.where(pre >= 0, pre, pre * neg_slope)
            v = jnp.where(band_mask(i), v, 0.0).astype(cdt)
            # store at lanes [0, gc) — sources are always read from lane 0
            filled = jnp.concatenate(
                [v, jnp.zeros((band * wp, LANE - gc), cdt)], axis=1)
            xs[r0: r0 + band] = filled.reshape(band, wp, LANE)

    contribute(x_vm, nf, wt0, 0)
    for s, wt_ref in ((1, wt1), (2, wt2), (3, wt3), (4, wt4)):
        activate(s)
        contribute(xs, gc, wt_ref, s * gc)

    # ---- output: x5*0.2 + x over the center rows [HALO, HALO+bh) ----
    for i in range(n_bands):
        lo = max(HALO, i * band)
        hi = min(HALO + bh, (i + 1) * band)
        if lo >= hi:
            continue
        r0 = 1 + i * band
        a = acc[r0: r0 + band].astype(f32).reshape(band * wp, n_total)
        x5 = a[:, 4 * gc: 4 * gc + nf]
        if (4 * gc) % LANE:
            x5 = _canon(x5)
        xf = x_vm[r0: r0 + band].reshape(band * wp, LANE).astype(f32)[:, :nf]
        o = (x5 * 0.2 + xf).astype(cdt)
        full = jnp.concatenate(
            [o, jnp.zeros((band * wp, LANE - nf), cdt)], axis=1
        ).reshape(band, wp, LANE)
        out_vm[lo - HALO: hi - HALO] = full[lo - i * band: hi - i * band]

    # full-wp strips into a block-major padded output (sublane-aligned DMA);
    # the wrapper crops the halo columns in XLA
    cpo = pltpu.make_async_copy(
        out_vm,
        out_ref.at[pl.program_id(0), pl.ds(by * bh, bh), pl.ds(bx * wp, wp), :],
        sem_out,
    )
    cpo.start()
    cpo.wait()


def fused_rdb_banded(
    x: jax.Array,
    weights: List[jax.Array],
    biases: List[jax.Array],
    *,
    gc: int = 32,
    block: Tuple[int, int] = (128, 112),
    band: int = 32,
    acc_dtype=None,
    neg_slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Banded fused ResidualDenseBlock_5C forward (see module docstring).

    x: (B, H, W, nf).  Block sizes are clamped/adjusted to divide H, W.
    """
    b, t_h, t_w, nf = x.shape
    bh, bw = block
    bh, bw = min(bh, t_h), min(bw, t_w)
    if t_h % bh:
        bh = next((d for d in (128, 64, 32, 16, 8) if t_h % d == 0), None)
    if t_w % bw:
        bw = next((d for d in (112, 128, 64, 48, 32, 16, 8) if t_w % d == 0), None)
    if bh is None or bw is None:
        raise ValueError(
            f"fused_rdb_banded needs H, W divisible by 8; got {t_h}x{t_w}"
        )
    band = min(band, 1 + ((bh + 2 * HALO - 1) // 8) * 8)
    hp = bh + 2 * HALO
    wp = -(-(bw + 2 * HALO) // 16) * 16
    w_slack = wp - bw - 2 * HALO
    n_bands = -(-hp // band)
    rows_total = 1 + n_bands * band + 1

    wt = _pack_source_weights(weights, nf, gc)
    bias_vec = jnp.concatenate([bs.astype(jnp.float32) for bs in biases])[None, :]

    xp = jnp.pad(
        x, [(0, 0), (HALO, HALO + (n_bands * band - hp)),
            (HALO, HALO + w_slack), (0, LANE - nf)],
    )

    n_total = 4 * gc + nf
    acc_dtype = acc_dtype or (jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16)
    kernel = functools.partial(
        _banded_kernel, nf=nf, gc=gc, bh=bh, bw=bw, t_h=t_h, t_w=t_w,
        band=band, n_bands=n_bands, neg_slope=neg_slope,
    )
    nbx = t_w // bw
    out = pl.pallas_call(
        kernel,
        grid=(b, t_h // bh, nbx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((b, t_h, nbx * wp, LANE), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_total, wp, LANE), x.dtype),        # x window
            pltpu.VMEM((rows_total, wp, LANE), x.dtype),        # recycled x_s
            pltpu.VMEM((rows_total, wp, n_total), acc_dtype),   # accumulator
            pltpu.VMEM((bh, wp, LANE), x.dtype),                # out staging
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, wt[0], wt[1], wt[2], wt[3], wt[4], bias_vec)
    # un-pad: per bx strip keep columns [HALO, HALO + bw)
    out5 = out.reshape(b, t_h, nbx, wp, LANE)[:, :, :, HALO: HALO + bw, :nf]
    return out5.reshape(b, t_h, t_w, nf)
