"""Spatial (intra-image) sharding with ICI halo exchange.

The tiled engine parallelizes over independent zero-padded tiles (no
communication).  This module provides the communicating alternative the
survey sketches (SURVEY.md §2.5): the image lives row-sharded across the
mesh and convolutions exchange boundary rows with mesh neighbors via
``ppermute`` (which XLA maps onto ICI), so one huge image can flow through
a conv without replicating or re-tiling it.

``halo_conv2d`` is the building block: a 3x3 (or kxk) conv over an H-sharded
NHWC tensor inside ``shard_map``.  Results are bit-equal to the unsharded
conv (tested on the virtual 8-device mesh).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from innfer_tpu.nn import functional as F


def _exchange_halo(x_local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate ``halo`` boundary rows from both mesh neighbors.

    Edge shards receive zeros (conv zero-padding semantics at the true
    image boundary).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # bottom rows of the previous shard -> our top halo
    from_prev = lax.ppermute(
        x_local[:, -halo:], axis_name,
        perm=[(i, i + 1) for i in range(n - 1)],
    )
    # top rows of the next shard -> our bottom halo
    from_next = lax.ppermute(
        x_local[:, :halo], axis_name,
        perm=[(i + 1, i) for i in range(n - 1)],
    )
    zeros = jnp.zeros_like(x_local[:, :halo])
    top = jnp.where(idx == 0, zeros, from_prev)
    bottom = jnp.where(idx == n - 1, zeros, from_next)
    return jnp.concatenate([top, x_local, bottom], axis=1)


def halo_conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "data",
    padding: int = 1,
) -> jax.Array:
    """Conv2d over an image row-sharded across ``mesh[axis]``.

    x: (N, H, W, C) with H divisible by the axis size; w: HWIO.  The H rows
    are sharded; each device convolves its slab after a ppermute halo
    exchange.  Equivalent to ``F.conv2d(x, w, b, padding=padding)``.
    """
    if padding == 0:
        raise ValueError("halo exchange is only meaningful for padded convs")

    def local(xl, wl, bl):
        xh = _exchange_halo(xl, padding, axis)
        # vertical padding became the halo; horizontal stays explicit
        return F.conv2d(
            xh, wl, bl,
            padding=[(0, 0), (padding, padding)],
        )

    spec_x = P(None, axis, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_x, P(), P()),
        out_specs=spec_x,
    )
    b = b if b is not None else jnp.zeros((w.shape[-1],), x.dtype)
    return fn(x, w, b)
