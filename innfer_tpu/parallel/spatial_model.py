"""Whole-model spatially-sharded inference: one huge image, H-sharded.

The tiled engine treats tiles as independent work items; this module is the
communicating alternative (SURVEY.md §2.5): the image lives row-sharded
across the mesh for the WHOLE forward pass — every 3x3 conv exchanges one
boundary row with its mesh neighbors over ICI (``ppermute``) and convolves
its local slab, so a single image too large to tile-batch can flow through
the full network without any host-side splitting.

Supported architectures: the flagship RRDBNet family (ESRGAN / ESRGAN+ /
lite, reference RRDBNet_arch.py:16-62) and SRResNet (same flattened macro
skeleton, SRResNet_arch.py:44-91) in their default inference
configurations — CNA conv blocks, no norm layers, non-parameterized
activations, upconv or pixelshuffle upsampling.  Other configs fall back
to the tiled engine.

Design notes (TPU):
  * one ``shard_map`` spans the entire forward — weights are broadcast
    (P()), the image is P(None, axis, None, None); XLA maps the per-conv
    ppermutes onto ICI and overlaps them with compute,
  * edge shards receive zeros from the (non-wrapping) permutation, which
    reproduces zero-pad conv semantics at the true image boundary, so the
    sharded forward is numerically identical to the unsharded one,
  * upsampling (nearest / pixelshuffle) is row-local, so it needs no
    communication; the shard simply doubles its local rows.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from innfer_tpu.models import common as C
from innfer_tpu.models.common import _outm
from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R
from innfer_tpu.parallel.spatial import _exchange_halo


def spatial_supported(cfg: Dict[str, Any]) -> bool:
    """True if this config can run the spatially-sharded forward."""
    default_act = "relu" if cfg.get("type") == "sr_resnet" else "leakyrelu"
    return (
        cfg.get("type") in ("rrdb_net", "mrrdb_net", "sr_resnet")
        and cfg.get("norm_type") in (None, "none")
        and (cfg.get("mode") or "CNA").upper() in ("CNA", "CNAC")
        and cfg.get("act_type", default_act) in
        ("relu", "leakyrelu", "lrelu", "tanh", "sigmoid")
        # parameterized final activations (prelu/swish) would need act-key
        # plumbing this forward does not have — reject here, not mid-trace
        and cfg.get("finalact") in
        (None, "relu", "leakyrelu", "lrelu", "tanh", "sigmoid")
        and cfg.get("convtype", "Conv2D") == "Conv2D"
    )


def spatial_rejection_reason(cfg: Dict[str, Any]) -> str:
    """Why this config cannot run spatially sharded (used in the loud
    error raised at session build; SURVEY §2.5 coverage-honesty record).

    PAN is the deliberate, recorded won't-do (VERDICT r4 #8): its trunk
    (SCPA: 1x1 convs + one 3x3 + pixel attention) IS mechanically
    halo-shardable, but two layers are not row-local:
      * the default FSA self-attention (PAN_arch.py:178-190) attends over
        ALL spatial positions — sharding it needs an all-gather of the
        pooled feature map AND its attention matrix is O((H*W/16)^2)
        memory, which is infeasible for exactly the huge single images
        --spatial exists for, sharded or not;
      * the global residual upsamples the INPUT with bilinear
        align_corners=True (PAN_arch.py:215-222), whose source rows are
        global-coordinate-dependent — a shard-local halo rule does not
        reproduce it exactly.
    Huge-image PAN runs are served by the tiled engine (and cross-image
    tile stacking); PAN at its bench size measured 60.9 MP/s tiled on one
    chip, so a communicating whole-image mode has no demonstrated need.
    """
    kind = cfg.get("type")
    if kind == "pan_net":
        return (
            "pan_net is deliberately unsupported by --spatial: the default "
            "FSA self-attention is global (its attention matrix alone is "
            "quadratic in image pixels — infeasible for the huge images "
            "--spatial targets), and the bilinear(align_corners=True) "
            "global input residual is not shard-local.  Use the tiled "
            "engine (default) for PAN.")
    return (
        "spatial sharding supports the default RRDB/SRResNet inference "
        f"configs only (got {kind}, norm={cfg.get('norm_type')}, "
        f"act={cfg.get('act_type')})")


def _conv3x3h(params, x, key, axis):
    """3x3 conv over the local slab with a 1-row halo exchange."""
    xh = _exchange_halo(x, 1, axis)
    return F.conv2d(xh, params[f"{key}.weight"], params.get(f"{key}.bias"),
                    padding=[(0, 0), (1, 1)])


def _rdb5c_h(params, x, prefix, *, act_type, plus, axis):
    cat = lambda *ts: jnp.concatenate(ts, axis=-1)
    conv = lambda i, t: _conv3x3h(params, t, f"{prefix}.conv{i}.0", axis)
    a = lambda t: F.act(act_type, t)

    x1 = a(conv(1, x))
    x2 = a(conv(2, cat(x, x1)))
    if plus:
        x2 = x2 + F.conv2d(x, params[f"{prefix}.conv1x1.weight"], None)
    x3 = a(conv(3, cat(x, x1, x2)))
    x4 = a(conv(4, cat(x, x1, x2, x3)))
    if plus:
        x4 = x4 + x2
    x5 = conv(5, cat(x, x1, x2, x3, x4))
    return x5 * jnp.asarray(0.2, x.dtype) + x


def _resnet_block_h(params, x, prefix, *, act_type, res_scale, axis):
    """SRResNet trunk block (SRResNet_arch.py:61-91), halo-exchange convs.
    Default-config key layout: conv0 at res.0 (CNA [conv, act]), conv1 at
    res.2 (act cleared)."""
    h = F.act(act_type, _conv3x3h(params, x, f"{prefix}.res.0", axis))
    h = _conv3x3h(params, h, f"{prefix}.res.2", axis)
    return x + h * jnp.asarray(res_scale, x.dtype)


def build_spatial_apply(cfg: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Return ``apply(params, x)`` running the full RRDB-family or SRResNet
    forward H-sharded.

    ``x`` is (N, H, W, C) with H divisible by the mesh axis size.  The
    result is mathematically exact vs the reference forward (halo-exchange
    convs see the same neighbor rows) but NOT bitwise-equal to
    ``build(cfg).apply``: the unsharded build applies the collapsed-upconv
    rewrite and the phase-space tail (different fp32 accumulation order),
    while this path materializes nearest-up + conv and the plain HR tail —
    validate against a materialized-tail reference (see
    tests/test_spatial_model.py), not bit-against apply().
    """
    if not spatial_supported(cfg):
        raise NotImplementedError(spatial_rejection_reason(cfg))
    kind = cfg.get("type")
    nb = cfg["nb"]
    nr = cfg.get("nr", 3)
    upscale = int(cfg.get("upscale", 4))
    act_type = cfg.get("act_type",
                       "relu" if kind == "sr_resnet" else "leakyrelu")
    plus = bool(cfg.get("plus", False))
    res_scale = float(cfg.get("res_scale", 1))
    up_mode = cfg.get("upsample_mode",
                      "pixelshuffle" if kind == "sr_resnet" else "upconv")
    finalact = cfg.get("finalact")
    outm = cfg.get("outm")
    _n_up, factor = C.n_upscale_blocks(upscale)
    up_convs, hr0 = C.upsample_indices(upscale, up_mode)
    names = (("RDB1", "RDB2", "RDB3") if nr == 3
             else tuple(f"RDBs.{i}" for i in range(nr)))

    def trunk_block(params, t, prefix):
        if kind == "sr_resnet":
            return _resnet_block_h(params, t, prefix, act_type=act_type,
                                   res_scale=res_scale, axis=axis)
        out = t
        for name in names:
            out = _rdb5c_h(params, out, f"{prefix}.{name}",
                           act_type=act_type, plus=plus, axis=axis)
        return out * jnp.asarray(0.2, t.dtype) + t

    def local(params, x):
        fea = _conv3x3h(params, x, "model.0", axis)
        t = fea
        for i in range(nb):
            t = trunk_block(params, t, f"model.1.sub.{i}")
        t = _conv3x3h(params, t, f"model.1.sub.{nb}", axis)
        h = fea + t
        for ci in up_convs:
            if up_mode == "upconv":
                h = R.upsample_nearest(h, factor)
                h = _conv3x3h(params, h, f"model.{ci}", axis)
                h = F.act(act_type, h)
            else:  # pixelshuffle
                h = _conv3x3h(params, h, f"model.{ci}", axis)
                h = F.pixel_shuffle(h, factor)
                h = F.act(act_type, h)
        h = F.act(act_type, _conv3x3h(params, h, f"model.{hr0}", axis))
        h = _conv3x3h(params, h, f"model.{hr0 + 2}", axis)
        if finalact:
            h = F.act(finalact, h)
        return _outm(h, outm)

    spec_x = P(None, axis, None, None)
    sharded = shard_map(local, mesh=mesh, in_specs=(P(), spec_x),
                        out_specs=spec_x)

    def apply(params, x):
        n = mesh.shape[axis]
        if x.shape[1] % n != 0:
            raise ValueError(
                f"H={x.shape[1]} must be divisible by the {axis}-axis size "
                f"{n} for spatial sharding (pad the input)")
        return sharded(params, x)

    return apply


class SpatialRunner:
    """Pipeline-facing runner: pad H to a shard multiple (edge rows), run
    the sharded forward (jit-cached per shape), crop the output back.

    Padding uses edge replication; outputs within the receptive field of
    the padded rows can differ from a pure whole-image forward (documented
    pipeline behavior for arbitrary image heights).
    """

    def __init__(self, model, mesh: Mesh, axis: str = "data"):
        self._apply = jax.jit(build_spatial_apply(model.cfg, mesh, axis))
        self.n = mesh.shape[axis]
        self.scale = model.scale
        self.output_index = model.output_index

    def __call__(self, params, x):
        h = x.shape[1]
        pad = (-h) % self.n
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad), (0, 0), (0, 0)], mode="edge")
        out = self._apply(params, x)
        if self.output_index is not None:
            out = out[self.output_index]
        if pad:
            out = out[:, : h * self.scale]
        return out


def spatial_run(model, params, x, mesh, axis: str = "data"):
    """One-shot convenience wrapper around :class:`SpatialRunner`."""
    return SpatialRunner(model, mesh, axis)(params, x)
