"""PPON (Progressive Perception-Oriented Network) in pure JAX, NHWC.

Parity target: /root/reference/architectures/PPON_arch.py:11-129.  Three
progressive branches share a trunk:

  CFEM (fea conv + ShortcutBlock of nb RRBlocks + LR conv)
    -> CRM  = upsample chain + HR convs          -> out_c (content)
  SFEM (2 RRBlocks on CFEM features)
    -> SRM + out_c                               -> out_s (structure)
  PFEM (2 RRBlocks on SFEM features)
    -> alpha * PRM + out_s                       -> out_p (perceptual)

Inference consumes index 2 (out_p), reference run.py:191-192,220-221.
Each _ResBlock_32 runs 8 parallel dilated 3x3 convs (rates 1..8) over a
shared lrelu(c1(x)), cascading sums, channel-concat, 1x1 fuse, 0.2 residual.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from innfer_tpu.models import common as C
from innfer_tpu.models.base import ModelDef
from innfer_tpu.nn import functional as F


def _res_block_32(params, x, prefix: str):
    lr = lambda t: F.leaky_relu(t, 0.2)
    conv = lambda name, t, pad, dil: F.conv2d(
        t, params[f"{prefix}.{name}.weight"], params.get(f"{prefix}.{name}.bias"),
        padding=pad, dilation=dil,
    )
    h = lr(conv("c1", x, 1, 1))
    ds = [conv(f"d{r}", h, r, r) for r in range(1, 9)]
    sums = [ds[0]]
    acc = ds[0]
    for d in ds[1:]:
        acc = acc + d
        sums.append(acc)
    combine = jnp.concatenate(sums, axis=-1)
    out2 = conv("c2", lr(combine), 0, 1)
    return x + out2 * jnp.asarray(0.2, x.dtype)


def _rr_block(params, x, prefix: str):
    out = x
    for name in ("RB1", "RB2", "RB3"):
        out = _res_block_32(params, out, f"{prefix}.{name}")
    return out * jnp.asarray(0.2, x.dtype) + x


def build(cfg: Dict[str, Any]) -> ModelDef:
    nb = cfg["nb"]
    upscale = int(cfg.get("upscale", 4))
    act_type = cfg.get("act_type", "lrelu")
    alpha = float(cfg.get("alpha", 1.0))
    if cfg.get("backend", "auto") == "pallas":
        # The fused _ResBlock_32 kernel was retired (round 4): the remote
        # Mosaic compiler rejects real PPON widths (nf=64) and reduced
        # widths won only +11% — 32-channel conv outputs pad 4x on the
        # 128-lane MXU in-kernel too.  See ops/pallas/ARCHIVE.md.
        raise NotImplementedError(
            "ppon backend='pallas' was retired; XLA is the one PPON path "
            "(ops/pallas/ARCHIVE.md records the fused-kernel experiment)")

    n_up, factor = C.n_upscale_blocks(upscale)
    # recon modules: [n_up x (Upsample, conv, act)] + HR0 conv + act + HR1 conv
    up_convs = [3 * i + 1 for i in range(n_up)]
    hr0 = 3 * n_up

    def recon(params, x, mod: str):
        h = x
        for ci in up_convs:
            h = C.apply_upsample_block(
                params, h, f"{mod}.{ci}", mode="upconv", factor=factor, act_type=act_type
            )
        h = F.act(act_type, C.conv3x3(params, h, f"{mod}.{hr0}"))
        return C.conv3x3(params, h, f"{mod}.{hr0 + 2}")

    def apply(params, x: jax.Array):
        fea = C.conv3x3(params, x, "CFEM.0")
        t = fea
        for i in range(nb):
            t = _rr_block(params, t, f"CFEM.1.sub.{i}")
        t = C.conv3x3(params, t, f"CFEM.1.sub.{nb}")
        out_cfem = fea + t

        out_c = recon(params, out_cfem, "CRM")

        out_sfem = out_cfem
        for i in range(2):
            out_sfem = _rr_block(params, out_sfem, f"SFEM.{i}")
        out_s = recon(params, out_sfem, "SRM") + out_c

        out_pfem = out_sfem
        for i in range(2):
            out_pfem = _rr_block(params, out_pfem, f"PFEM.{i}")
        out_p = jnp.asarray(alpha, x.dtype) * recon(params, out_pfem, "PRM") + out_s

        return out_c, out_s, out_p

    return ModelDef(
        name="ppon", cfg=dict(cfg), apply=apply, scale=upscale, output_index=2,
    )
