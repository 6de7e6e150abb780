"""SRResNet (SRGAN generator) in pure JAX, NHWC.

Parity target: /root/reference/architectures/SRResNet_arch.py:15-91.  Same
flattened-sequential macro skeleton as RRDBNet; the trunk blocks are
ResNetBlocks whose two conv_blocks follow the configured mode:

  CNA  : conv0 = [conv, norm?, act], conv1 = [conv, norm?]   (act cleared)
  CNAC : conv0 = [conv, norm?, act], conv1 = [conv]          (act+norm cleared)
  NAC  : conv0 = [norm?, act, conv], conv1 = [norm?, act, conv]

(ResNetBlock act/norm clearing: SRResNet_arch.py:73-78; conv_block ordering:
block.py:213-254.)  ``self.res = B.sequential(conv0, conv1)`` flattens both
blocks' children into one positional list, which determines the state-dict
keys (``model.1.sub.<i>.res.<j>``; the srgan fingerprint key at run.py:54).
The default library config (norm None, act relu, mode CNA, pixelshuffle)
keeps the historical ``res.0``/``res.2`` conv keys.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from innfer_tpu.models import common as C
from innfer_tpu.models.base import ModelDef
from innfer_tpu.models.common import _outm
from innfer_tpu.nn import functional as F


def build(cfg: Dict[str, Any]) -> ModelDef:
    nb = cfg["nb"]
    upscale = int(cfg.get("upscale", 4))
    act_type = cfg.get("act_type", "relu")
    up_mode = cfg.get("upsample_mode", "pixelshuffle")
    res_scale = float(cfg.get("res_scale", 1))
    finalact = cfg.get("finalact")
    outm = cfg.get("outm")
    norm_type = cfg.get("norm_type")
    if norm_type in ("none",):
        norm_type = None
    conv_mode = (cfg.get("mode") or "CNA").upper()
    if norm_type not in (None, "batch", "instance"):
        raise NotImplementedError(
            f"normalization layer [{norm_type}] is not found")
    if conv_mode not in ("CNA", "NAC", "CNAC"):
        raise NotImplementedError(f"Wrong conv mode [{conv_mode}]")

    _n_up, factor = C.n_upscale_blocks(upscale)
    up_convs, hr0 = C.upsample_indices(upscale, up_mode)
    act_off = 1 if up_mode == "upconv" else 2

    # ResNetBlock: conv1's act is cleared under CNA, act+norm under CNAC
    # (SRResNet_arch.py:73-78)
    c1_act = act_type if conv_mode == "NAC" else None
    c1_norm = None if conv_mode == "CNAC" else norm_type
    lay0 = C.conv_block_layout(conv_mode, norm_type, act_type)
    len0 = len(lay0)

    def res_block(params, x, prefix):
        h = C.apply_conv_block(
            params, x, lambda j: f"{prefix}.res.{j}", mode=conv_mode,
            norm_type=norm_type, act_type=act_type)
        h = C.apply_conv_block(
            params, h, lambda j: f"{prefix}.res.{len0 + j}", mode=conv_mode,
            norm_type=c1_norm, act_type=c1_act)
        return x + h * jnp.asarray(res_scale, x.dtype)

    def apply_trunk(params, x: jax.Array) -> jax.Array:
        """fea conv -> nb ResNetBlocks -> LR conv -> shortcut sum (the
        LR-resolution bulk); split out for hybrid whole-image-trunk
        inference (engine.hybrid_apply), like models/rrdb.py."""
        fea = C.conv3x3(params, x, "model.0")
        t = fea
        for i in range(nb):
            t = res_block(params, t, f"model.1.sub.{i}")
        t = C.apply_conv_block(
            params, t, lambda j: f"model.1.sub.{nb + j}", mode=conv_mode,
            norm_type=norm_type, act_type=None)
        return fea + t

    def apply_tail(params, h: jax.Array) -> jax.Array:
        phase_tail = up_convs and C.phase_tail_ok(
            params, f"model.{up_convs[-1]}", factor=factor, up_mode=up_mode,
            act_type=act_type, finalact=finalact)
        for ci in (up_convs[:-1] if phase_tail else up_convs):
            h = C.apply_upsample_block(
                params, h, f"model.{ci}", mode=up_mode, factor=factor,
                act_type=act_type, act_key=f"model.{ci + act_off}")
        if phase_tail:
            # last upsample block + HR convs in phase space (nn/phase.py)
            h = C.apply_phase_tail(
                params, h, up_key=f"model.{up_convs[-1]}", up_mode=up_mode,
                act_type=act_type, hr0=hr0, finalact=finalact)
            return _outm(h, outm)
        h = F.act(act_type, C.conv3x3(params, h, f"model.{hr0}"),
                  params=params, key=f"model.{hr0 + 1}")
        h = C.conv3x3(params, h, f"model.{hr0 + 2}")
        if finalact:
            h = F.act(finalact, h, params=params, key=f"model.{hr0 + 3}")
        return _outm(h, outm)

    def apply(params, x: jax.Array) -> jax.Array:
        return apply_tail(params, apply_trunk(params, x))

    return ModelDef(name="sr_resnet", cfg=dict(cfg), apply=apply,
                    scale=upscale, apply_trunk=apply_trunk,
                    apply_tail=apply_tail, tail_halo=4)
