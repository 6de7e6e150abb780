"""SRResNet (SRGAN generator) in pure JAX, NHWC.

Parity target: /root/reference/architectures/SRResNet_arch.py:15-91 with the
library defaults (norm_type=None, act relu, mode CNA, pixelshuffle upsample,
res_scale=1; reference utils/defaults.py:53-67).  Same flattened-sequential
macro skeleton as RRDBNet; the trunk blocks are plain conv-relu-conv
residuals ('model.1.sub.<i>.res.{0,2}' keys — the srgan fingerprint key at
run.py:54).
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
    mode = cfg.get("upsample_mode", "pixelshuffle")
    res_scale = float(cfg.get("res_scale", 1))
    finalact = cfg.get("finalact")
    outm = cfg.get("outm")
    if cfg.get("norm_type") not in (None, "none"):
        raise NotImplementedError("SRResNet with norm layers is not supported")

    _n_up, factor = C.n_upscale_blocks(upscale)
    up_convs, hr0 = C.upsample_indices(upscale, mode)

    def res_block(params, x, prefix):
        h = F.act(act_type, C.conv3x3(params, x, f"{prefix}.res.0"))
        h = C.conv3x3(params, h, f"{prefix}.res.2")
        return x + h * jnp.asarray(res_scale, x.dtype)

    def apply(params, x: jax.Array) -> jax.Array:
        fea = C.conv3x3(params, x, "model.0")
        t = fea
        for i in range(nb):
            t = res_block(params, t, f"model.1.sub.{i}")
        t = C.conv3x3(params, t, f"model.1.sub.{nb}")
        h = fea + t
        for ci in up_convs:
            h = C.apply_upsample_block(
                params, h, f"model.{ci}", mode=mode, factor=factor, act_type=act_type
            )
        h = F.act(act_type, C.conv3x3(params, h, f"model.{hr0}"))
        h = C.conv3x3(params, h, f"model.{hr0 + 2}")
        if finalact:
            h = F.act(finalact, h)
        return _outm(h, outm)

    return ModelDef(name="sr_resnet", cfg=dict(cfg), apply=apply, scale=upscale)
