"""PAN (Pixel Attention Network) in pure JAX, NHWC.

Parity target: /root/reference/architectures/PAN_arch.py:11-222 and the FSA
self-attention block (block.py:398-473):

  conv_first -> nb x SCPA trunk (+ optional second trunk) -> trunk conv
  -> (+fea) through FSA self-attention (maxpool4 -> SAGAN attention ->
     bicubic restore -> gamma*out + input)
  -> pixel-attention upsample chain -> conv_last
  -> + bilinear(align_corners=True)-upscaled input residual

The SAGAN attention is a natural MXU fit: three 1x1 Conv1d projections
become channel matmuls and the N x N attention is one batched einsum.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from innfer_tpu.models.base import ModelDef
from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R


def _conv(params, x, key, *, k=3, pad=None, dilation=1):
    pad = (k - 1) // 2 if pad is None else pad
    return F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"),
                    padding=pad, dilation=dilation)


def _pacnv(params, x, prefix: str):
    """Pixel-attention conv: k4( k3(x) * sigmoid(k2(x)) )  (PAN_arch.py:37-57)."""
    y = F.sigmoid(_conv(params, x, f"{prefix}.k2", k=1))
    out = _conv(params, x, f"{prefix}.k3", k=3) * y
    return _conv(params, out, f"{prefix}.k4", k=3)


def _scpa(params, x, prefix: str):
    """Self-calibrated block with pixel attention (PAN_arch.py:59-101)."""
    lr = lambda t: F.leaky_relu(t, 0.2)
    a = lr(_conv(params, x, f"{prefix}.conv1_a", k=1))
    b = lr(_conv(params, x, f"{prefix}.conv1_b", k=1))
    a = lr(_conv(params, a, f"{prefix}.k1.0", k=3))
    b = lr(_pacnv(params, b, f"{prefix}.PACnv"))
    out = _conv(params, jnp.concatenate([a, b], axis=-1), f"{prefix}.conv3", k=1)
    return out + x


def _fsa(params, x, prefix: str, *, poolsize: int = 4):
    """Flexible Self Attention: maxpool -> SAGAN attention -> bicubic restore
    -> gamma * out + input  (block.py:434-473)."""
    bsz, hh, ww, cc = x.shape
    p = F.max_pool2d(x, poolsize)
    ph, pw = p.shape[1], p.shape[2]
    n = ph * pw
    flat = p.reshape(bsz, n, cc)
    f = F.dense(flat, params[f"{prefix}.conv_f.weight"], params[f"{prefix}.conv_f.bias"])
    g = F.dense(flat, params[f"{prefix}.conv_g.weight"], params[f"{prefix}.conv_g.bias"])
    h = F.dense(flat, params[f"{prefix}.conv_h.weight"], params[f"{prefix}.conv_h.bias"])
    s = jnp.einsum("bnc,bmc->bnm", f, g, preferred_element_type=jnp.float32,
                   precision=F._mm_precision(x.dtype))
    att = F.softmax(s, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnm,bmc->bnc", att, h, preferred_element_type=jnp.float32,
                     precision=F._mm_precision(x.dtype)).astype(x.dtype)
    out = out.reshape(bsz, ph, pw, cc)
    out = R.interpolate(out, size=(hh, ww), mode="bicubic", align_corners=False)
    gamma = params[f"{prefix}.gamma"].astype(jnp.float32)
    return (gamma * out.astype(jnp.float32) + x.astype(jnp.float32)).astype(x.dtype)


def build(cfg: Dict[str, Any]) -> ModelDef:
    nb = cfg["nb"]
    scale = int(cfg.get("scale", 4))
    self_attention = bool(cfg.get("self_attention", True))
    double_scpa = bool(cfg.get("double_scpa", False))
    ups_mode = cfg.get("ups_inter_mode", "nearest")
    if ups_mode not in ("nearest", "bilinear"):
        raise NotImplementedError(f"PAN ups_inter_mode [{ups_mode}] not supported")

    if scale == 3:
        n_up, factor = 1, 3
    elif scale == 1:
        n_up, factor = 0, 2
    else:
        n_up, factor = int(math.log2(scale)), 2

    # pa_upconv block quirk: the reference reuses ONE act module at two
    # positions (PAN_arch.py:19 'upconv, att, a, HRconv, a').  With a single
    # block (scale 2/3) B.sequential returns the block unflattened
    # (block.py:199-202) and both act positions survive; with >=2 blocks the
    # flattening goes through nn.Module.children() (block.py:206) which
    # dedupes the repeated module, so every block's trailing activation
    # after HRconv VANISHES and blocks are 5 modules wide.  Real multi-block
    # PAN checkpoints embody this, so we reproduce it exactly.
    multi = n_up >= 2
    stride_mods = 5 if multi else 6

    def pa_up(params, x, base: int):
        if ups_mode == "nearest":
            x = R.upsample_nearest(x, factor)
        else:
            # B.Upsample(mode='bilinear') -> F.interpolate align_corners=None,
            # i.e. the align_corners=False path (PAN_arch.py:14, block.py:310)
            x = R.interpolate(
                x, size=(x.shape[1] * factor, x.shape[2] * factor),
                mode="bilinear", align_corners=False)
        x = _conv(params, x, f"upsample.{base + 1}", k=3)
        att = F.sigmoid(_conv(params, x, f"upsample.{base + 2}.conv", k=1))
        x = F.leaky_relu(x * att, 0.2)
        x = _conv(params, x, f"upsample.{base + 4}", k=3)
        return x if multi else F.leaky_relu(x, 0.2)

    def apply(params, x: jax.Array) -> jax.Array:
        fea = _conv(params, x, "conv_first", k=3)
        t = fea
        for i in range(nb):
            t = _scpa(params, t, f"SCPA_trunk.{i}")
        t = _conv(params, t, "trunk_conv", k=3)
        if double_scpa:
            for i in range(nb):
                t = _scpa(params, t, f"SCPA_trunk2.{i}")
            t = _conv(params, t, "trunk_conv2", k=3)

        h = fea + t
        if self_attention:
            h = _fsa(params, h, "FSA")

        for u in range(n_up):
            h = pa_up(params, h, stride_mods * u)

        out = _conv(params, h, "conv_last", k=3)
        if scale > 1:
            ilr = R.interpolate(x, scale_factor=float(scale), mode="bilinear",
                                align_corners=True)
        else:
            ilr = x
        return out + ilr

    return ModelDef(
        name="pan_net",
        cfg=dict(cfg),
        apply=apply,
        scale=scale,
        dense_keys=(r"FSA\.conv_[fgh]\.weight",),
    )
