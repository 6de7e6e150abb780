"""Image-quality metrics: PSNR and SSIM, jit-compiled on device.

The reference computes no metrics (SURVEY.md §5 observability); these back
the benchmark harness and the CLI ``--metrics`` option for validating model
chains against ground-truth directories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from innfer_tpu.ops.filters import filter2d

Array = jax.Array


def psnr(a: Array, b: Array, peak: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB over all elements."""
    a32 = jnp.asarray(a, jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    mse = jnp.mean(jnp.square(a32 - b32))
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-20))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(a: Array, b: Array, peak: float = 1.0, size: int = 11,
         sigma: float = 1.5) -> Array:
    """Mean structural similarity (Wang et al. 2004) on NHWC images."""
    if a.ndim == 3:
        a, b = a[None], b[None]
    a32 = jnp.asarray(a, jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    k = _gaussian_kernel(size, sigma)
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2

    mu_a = filter2d(a32, k)
    mu_b = filter2d(b32, k)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = filter2d(a32 * a32, k) - mu_aa
    var_b = filter2d(b32 * b32, k) - mu_bb
    cov = filter2d(a32 * b32, k) - mu_ab

    num = (2 * mu_ab + c1) * (2 * cov + c2)
    den = (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def psnr_np(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Host-side PSNR for uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else float(10 * np.log10(peak * peak / mse))


def ssim_np(a: np.ndarray, b: np.ndarray, peak: float = 1.0, size: int = 11,
            sigma: float = 1.5) -> float:
    """Host-side SSIM, same math as :func:`ssim` via cv2.filter2D.

    The product loop's ``--metrics`` path runs on the background encode
    pool; dispatching the device ``ssim`` from a pool thread would queue
    its graph behind later images' forwards and block on a device
    round-trip (the out-of-order-dispatch stall DeviceBands documents) —
    host numpy keeps pool threads transfer/codec-only."""
    import cv2

    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    k = np.outer(g, g).astype(np.float32)
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2

    def f(im):
        # BORDER_REFLECT_101 == filter2d's default 'reflect' (torch-style)
        return cv2.filter2D(im, -1, k, borderType=cv2.BORDER_REFLECT_101)

    mu_a, mu_b = f(a32), f(b32)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = f(a32 * a32) - mu_aa
    var_b = f(b32 * b32) - mu_bb
    cov = f(a32 * b32) - mu_ab
    num = (2 * mu_ab + c1) * (2 * cov + c2)
    den = (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))
