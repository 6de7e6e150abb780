"""Device-side image filters: filter2D, guided filter, gaussian blur, color_fix.

JAX equivalents of /root/reference/utils/utils.py:448-626 (filter2D /
guided_filter) and utils.py:278-315 (color_fix), all jit-friendly NHWC.
Unlike the reference (host numpy/cv2 for color_fix), everything here runs on
device and fuses into the surrounding graph.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R
from innfer_tpu.ops import colors

Array = jax.Array


def box_kernel(k: int) -> jnp.ndarray:
    """Mean-filter kernel (reference utils.py:538-546)."""
    return jnp.full((k, k), 1.0 / (k * k), dtype=jnp.float32)


def _filter_pads(kh: int, kw: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """(top,bottom),(left,right) pads matching the reference compute_padding
    (utils.py:457-481): symmetric for odd kernels, asymmetric for even."""
    top = kh // 2 - (1 if kh % 2 == 0 else 0)
    left = kw // 2 - (1 if kw % 2 == 0 else 0)
    return (top, kh // 2), (left, kw // 2)


def filter2d(x: Array, kernel: Array, border: str = "reflect",
             normalized: bool = False) -> Array:
    """Depthwise 2D filtering with same-size output (utils.py:484-535)."""
    kh, kw = kernel.shape
    if normalized:
        kernel = kernel / jnp.sum(jnp.abs(kernel))
    (pt, pb), (pl, pr) = _filter_pads(kh, kw)
    mode = {"reflect": "reflect", "replicate": "replicate", "constant": "zero"}[border]
    xp = F.pad2d(x, (pl, pr, pt, pb), mode=mode)
    c = x.shape[-1]
    w = jnp.broadcast_to(kernel.astype(x.dtype)[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
        precision=F._mm_precision(x.dtype),
    ).astype(x.dtype)


def guided_filter(
    x: Array,
    y: Array,
    x_hr: Optional[Array] = None,
    *,
    ks: Optional[int] = None,
    r: Optional[int] = None,
    eps: float = 1e-2,
    mode: str = "regular",
    conv_a=None,
) -> Array:
    """Edge-preserving guided filter (He et al.), matching the reference
    implementation (utils.py:549-626).

    x: guidance NHWC; y: filtering input NHWC; mode 'regular' filters at x's
    resolution, 'fast' upsamples the linear coefficients to ``x_hr``
    (bilinear, align_corners=True) for joint upsampling, 'conv' computes the
    A coefficients with a learned callable ``conv_a(cat(cov_xy, var_x))``
    (utils.py:604-605) and joint-upsamples like 'fast'.
    """
    if ks is None:
        if r is None:
            raise ValueError("either kernel size (ks) or radius (r) is required")
        ks = 2 * r + 1
    k = box_kernel(ks)

    x32, y32 = x.astype(jnp.float32), y.astype(jnp.float32)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), jnp.float32)
    n = filter2d(ones, k)
    mean_x = filter2d(x32, k) / n
    mean_y = filter2d(y32, k) / n
    cov_xy = filter2d(x32 * y32, k) / n - mean_x * mean_y
    var_x = filter2d(x32 * x32, k) / n - mean_x * mean_x

    if mode == "conv":
        if conv_a is None:
            raise ValueError("conv mode requires the conv_a callable")
        a = conv_a(jnp.concatenate([cov_xy, var_x], axis=-1)).astype(jnp.float32)
    else:
        a = cov_xy / (var_x + eps)
    b = mean_y - a * mean_x

    if mode in ("fast", "conv"):
        if x_hr is None:
            raise ValueError(f"{mode} mode requires x_hr")
        size = (x_hr.shape[1], x_hr.shape[2])
        mean_a = R.interpolate(a, size=size, mode="bilinear", align_corners=True)
        mean_b = R.interpolate(b, size=size, mode="bilinear", align_corners=True)
        out = mean_a * x_hr.astype(jnp.float32) + mean_b
    elif mode == "regular":
        mean_a = filter2d(a, k) / n
        mean_b = filter2d(b, k) / n
        out = mean_a * x32 + mean_b
    else:
        raise NotImplementedError(f"guided_filter mode [{mode}]")
    return out.astype(y.dtype)


# cv2.getGaussianKernel(3, 0) == [0.25, 0.5, 0.25]
_GAUSS3 = np.outer([0.25, 0.5, 0.25], [0.25, 0.5, 0.25]).astype(np.float32)


def gaussian_blur3(x: Array) -> Array:
    """3x3 Gaussian blur with sigma=0 cv2 semantics (reflect-101 border)."""
    return filter2d(x, jnp.asarray(_GAUSS3), border="reflect")


def color_fix(img_ref: Array, img_out: Array) -> Array:
    """Transfer low-frequency color from ``img_ref`` to ``img_out``.

    Device-side equivalent of reference utils.py:278-315: both srgb->linear,
    bicubic-downscale output to the reference size, blur the difference
    (3x3 gaussian), upscale, add back, linear->srgb uint8.  Inputs are HWC
    or NHWC uint8/float [0,255]; returns uint8 in the same rank.
    """
    squeeze = img_ref.ndim == 3
    if squeeze:
        img_ref, img_out = img_ref[None], img_out[None]
    lin_a = colors.srgb_to_linear(img_ref)
    lin_b = colors.srgb_to_linear(img_out)
    ha, wa = lin_a.shape[1], lin_a.shape[2]
    hb, wb = lin_b.shape[1], lin_b.shape[2]
    if ha < hb and wa < wb:
        ds = R.interpolate(lin_b, size=(ha, wa), mode="bicubic", align_corners=False)
        diff = gaussian_blur3(lin_a - ds)
        diff = R.interpolate(diff, size=(hb, wb), mode="bicubic", align_corners=False)
    else:
        diff = gaussian_blur3(lin_a - lin_b)
    out = colors.linear_to_srgb(diff + lin_b)
    return out[0] if squeeze else out
