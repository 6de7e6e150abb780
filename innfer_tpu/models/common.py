"""Shared pieces of the flattened-sequential SR skeleton.

RRDBNet, SRResNet and PPON all share the traiNNer "flattened nn.Sequential"
macro-structure (fea conv -> trunk-with-global-skip -> upsample chain ->
HR convs; reference RRDBNet_arch.py:47-48, SRResNet_arch.py:44-45,
PPON_arch.py:52-63), with parameter keys given by positional indices.  The
helpers here compute those indices and apply the upsample blocks.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax

from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R

Params = dict


def n_upscale_blocks(upscale: int) -> Tuple[int, int]:
    """Number of upsample blocks and the per-block factor.

    2^k scales use k blocks of 2x; scale 3 uses one 3x block; scale 1 none.
    (reference RRDBNet_arch.py:21-23)
    """
    if upscale == 3:
        return 1, 3
    if upscale == 1:
        return 0, 2
    return int(math.log2(upscale)), 2


def upsample_indices(upscale: int, mode: str, start: int = 2) -> Tuple[List[int], int]:
    """Positional indices of the conv inside each upsample block, plus the
    index of the first HR conv, matching the flattened Sequential layout.

    upconv block      = [Upsample, Conv, Act]  -> conv at i+1, next at i+3
    pixelshuffle block = [Conv, PixelShuffle, Act] -> conv at i, next at i+3
    """
    n_up, _factor = n_upscale_blocks(upscale)
    conv_idxs = []
    i = start
    for _ in range(n_up):
        conv_idxs.append(i + 1 if mode == "upconv" else i)
        i += 3
    return conv_idxs, i


def apply_upsample_block(
    params: Params, x: jax.Array, key: str, *, mode: str, factor: int, act_type: str
) -> jax.Array:
    """One upsample block (upconv: nearest-resize+conv+act, reference
    block.py:348-361; pixelshuffle: conv+shuffle+act, block.py:333-346)."""
    if mode == "upconv":
        x = R.upsample_nearest(x, factor)
        x = F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"), padding=1)
        return F.act(act_type, x)
    if mode == "pixelshuffle":
        x = F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"), padding=1)
        x = F.pixel_shuffle(x, factor)
        return F.act(act_type, x)
    raise NotImplementedError(f"upsample mode [{mode}] is not found")


def conv3x3(params: Params, x: jax.Array, key: str) -> jax.Array:
    return F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"), padding=1)


def _outm(x, outm):
    """Optional output cap (reference RRDBNet_arch.py:50-62 forward outm):
    scaltanh | tanh | sigmoid | clamp | None."""
    import jax.numpy as jnp

    if outm == "scaltanh":
        return (jnp.tanh(x) + 1.0) / 2.0
    if outm == "tanh":
        return jnp.tanh(x)
    if outm == "sigmoid":
        return F.sigmoid(x)
    if outm == "clamp":
        return jnp.clip(x, 0.0, 1.0)
    return x
