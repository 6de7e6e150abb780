"""Color-space and range transforms, compiled into the device graph.

JAX equivalents of /root/reference/utils/colors.py:5-60 and the norm/denorm
helpers (utils/utils.py:136-161).  All functions operate on NHWC (or HWC)
arrays and are jit-friendly so XLA fuses them into the surrounding forward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bgr_to_rgb(x: Array) -> Array:
    """Flip the channel axis (works for RGB and stacked 3xRGB video)."""
    return jnp.flip(x, axis=-1)


rgb_to_bgr = bgr_to_rgb


def bgra_to_rgba(x: Array) -> Array:
    return x[..., jnp.array([2, 1, 0, 3])]


rgba_to_bgra = bgra_to_rgba


def norm(x: Array) -> Array:
    """[0,1] -> [-1,1] with clamp (reference utils.py:152-161)."""
    return jnp.clip((x - 0.5) * 2.0, -1.0, 1.0)


def denorm(x: Array) -> Array:
    """[-1,1] -> [0,1] with clamp (reference utils.py:136-150)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def srgb_to_linear(srgb: Array, gamma: float = 2.4, th: float = 0.04045) -> Array:
    """sRGB [0,255] -> linear [0,1] (reference colors.py:29-46)."""
    a, att = 0.055, 12.92
    x = srgb.astype(jnp.float32) / 255.0
    return jnp.where(x <= th, x / att, jnp.power((x + a) / (1 + a), gamma))


def linear_to_srgb(linear: Array, gamma: float = 2.4, th: float = 0.0031308) -> Array:
    """linear [0,1] -> sRGB uint8 [0,255] (reference colors.py:49-60)."""
    a, att = 0.055, 12.92
    x = jnp.clip(linear, 0.0, 1.0)
    srgb = jnp.where(x <= th, x * att, (1 + a) * jnp.power(x, 1.0 / gamma) - a)
    return jnp.clip(srgb * 255.0, 0.0, 255.0).astype(jnp.uint8)
