"""Image resizing with exact torch.nn.functional.interpolate semantics.

Implemented as separable 1D gathers with statically-precomputed (numpy)
index/weight tables, so under ``jit`` the tables are constants and each
resize compiles to two gathers + weighted sums — no data-dependent shapes.

Modes and their users in the reference implementation:
  * nearest (integer scale)      — ESRGAN/PPON/PAN upconv blocks
                                   (block.py:348-361, PAN_arch.py:11-19)
  * bilinear, align_corners=True — PAN global input residual
                                   (PAN_arch.py:215-218), guided-filter
                                   'fast' mode (utils/utils.py:612-618)
  * bilinear, align_corners=False— WBC pt-mode 2x upsample
                                   (WBCNet_arch.py:65-68)
  * bicubic,  align_corners=False— FSA self-attention restore
                                   (block.py:463-466)
  * TF-style 2x bilinear         — WBC tf-mode (WBCNet_arch.py:127-138)

All behaviors verified against torch CPU in tests/test_resize.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _source_positions(out_size: int, in_size: int, align_corners: bool, cubic: bool) -> np.ndarray:
    """Fractional source coordinates for each output index (float64).

    Mirrors torch's area_pixel_compute_source_index: the half-pixel formula
    clamps at zero for linear modes but not for cubic.
    """
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size <= 1:
            return np.zeros(out_size, dtype=np.float64)
        scale = (in_size - 1) / (out_size - 1)
        return dst * scale
    scale = in_size / out_size
    src = (dst + 0.5) * scale - 0.5
    if not cubic:
        src = np.maximum(src, 0.0)
    return src


def _linear_tables(out_size: int, in_size: int, align_corners: bool):
    src = _source_positions(out_size, in_size, align_corners, cubic=False)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    idx = np.stack([i0, i1], axis=1)  # (out, 2)
    wts = np.stack([w0, w1], axis=1)  # (out, 2)
    return idx, wts


def _cubic_kernel(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), A=-0.75 as used by torch."""
    at = np.abs(t)
    at2 = at * at
    at3 = at2 * at
    w = np.where(
        at <= 1.0,
        (A + 2.0) * at3 - (A + 3.0) * at2 + 1.0,
        np.where(at < 2.0, A * at3 - 5.0 * A * at2 + 8.0 * A * at - 4.0 * A, 0.0),
    )
    return w


def _cubic_tables(out_size: int, in_size: int, align_corners: bool):
    src = _source_positions(out_size, in_size, align_corners, cubic=True)
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    taps = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=1)  # (out, 4)
    offs = np.array([-1.0, 0.0, 1.0, 2.0])
    wts = _cubic_kernel(offs[None, :] - frac[:, None])  # (out, 4)
    taps = np.clip(taps, 0, in_size - 1)
    return taps, wts


def _nearest_tables(out_size: int, in_size: int) -> np.ndarray:
    # torch 'nearest': src = floor(dst * in/out), clamped.
    dst = np.arange(out_size, dtype=np.float64)
    idx = np.floor(dst * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _apply_1d(x: Array, idx: np.ndarray, wts: Optional[np.ndarray], axis: int) -> Array:
    """Gather+blend along one axis with static tables."""
    if wts is None:  # nearest
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    ntaps = idx.shape[1]
    acc = None
    for t in range(ntaps):
        g = jnp.take(x, jnp.asarray(idx[:, t]), axis=axis).astype(jnp.float32)
        w = jnp.asarray(wts[:, t], dtype=jnp.float32)
        shape = [1] * x.ndim
        shape[axis] = -1
        g = g * w.reshape(shape)
        acc = g if acc is None else acc + g
    return acc


def interpolate(
    x: Array,
    size: Optional[Tuple[int, int]] = None,
    scale_factor: Optional[float] = None,
    mode: str = "nearest",
    align_corners: Optional[bool] = None,
) -> Array:
    """torch.nn.functional.interpolate for NHWC tensors (2D spatial).

    Output sizes from scale_factor use floor(in * scale) like torch.
    """
    b, h, w, c = x.shape
    if size is None:
        if scale_factor is None:
            raise ValueError("either size or scale_factor is required")
        sf = scale_factor if isinstance(scale_factor, (tuple, list)) else (scale_factor, scale_factor)
        size = (int(np.floor(h * sf[0])), int(np.floor(w * sf[1])))
    oh, ow = size
    dtype = x.dtype

    if mode == "nearest":
        if oh % h == 0 and ow % w == 0:
            # integer upscale: pure repeat (fuses well on TPU)
            rh, rw = oh // h, ow // w
            out = jnp.repeat(jnp.repeat(x, rh, axis=1), rw, axis=2)
            return out
        out = _apply_1d(x, _nearest_tables(oh, h), None, axis=1)
        out = _apply_1d(out, _nearest_tables(ow, w), None, axis=2)
        return out

    ac = bool(align_corners)
    if mode == "bilinear":
        ih, wh = _linear_tables(oh, h, ac)
        iw, ww = _linear_tables(ow, w, ac)
    elif mode == "bicubic":
        ih, wh = _cubic_tables(oh, h, ac)
        iw, ww = _cubic_tables(ow, w, ac)
    else:
        raise NotImplementedError(f"interpolate mode [{mode}]")

    out = _apply_1d(x, ih, wh, axis=1)
    out = _apply_1d(out, iw, ww, axis=2)
    return out.astype(dtype)


def upsample_nearest(x: Array, r: int) -> Array:
    """Fast integer nearest upsample (== interpolate mode='nearest')."""
    return jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)


def tf_2x_bilinear(x: Array) -> Array:
    """TF-style 2x bilinear upsample used by WBC tf-mode checkpoints.

    Reproduces reference WBCNet_arch.py:127-138: even taps copy the source,
    odd taps average with the replicate-padded next pixel.
    """
    b, h, w, c = x.shape
    pad = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)], mode="edge")
    p00 = pad[:, :-1, :-1, :]       # == x
    p10 = pad[:, 1:, :-1, :]        # next row
    p01 = pad[:, :-1, 1:, :]        # next col
    p11 = pad[:, 1:, 1:, :]         # next row+col
    half = jnp.asarray(0.5, x.dtype)
    e00 = p00
    e10 = (p00 + p10) * half
    e01 = (p00 + p01) * half
    e11 = (p00 + p11) * half
    # interleave: out[2i, 2j]=e00, out[2i+1, 2j]=e10, out[2i,2j+1]=e01, ...
    top = jnp.stack([e00, e01], axis=3).reshape(b, h, 2 * w, c)
    bot = jnp.stack([e10, e11], axis=3).reshape(b, h, 2 * w, c)
    out = jnp.stack([top, bot], axis=2).reshape(b, 2 * h, 2 * w, c)
    return out
