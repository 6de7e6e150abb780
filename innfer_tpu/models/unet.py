"""pix2pix UNet generator in pure JAX, NHWC.

Parity target: /root/reference/architectures/UNet_arch.py:11-161.  The
reference constructs the UNet recursively innermost-out; here the recursion
is replaced by an explicit level list (0 = outermost .. L-1 = innermost)
that reproduces the exact torch key naming:

  prefix(0)   = 'model.model'
  prefix(l+1) = prefix(l) + ('.1.model' if l == 0 else '.3.model')

  level layout (Sequential indices):
    outermost: [downconv(0), sub(1), uprelu(2), upconv(3), Tanh(4)]
    mid:       [downrelu(0), downconv(1), downnorm(2), sub(3),
                uprelu(4), upconv(5), upnorm(6), (dropout)]
    innermost: [downrelu(0), downconv(1), uprelu(2), upconv(3), upnorm(4)]

Skip connections concatenate block input with block output on channels.
pix2pix runs with meval=False (train-mode BatchNorm, batch statistics;
reference run.py:299-303) — the ``meval`` flag selects that behavior.
Dropout (p=0.5) is treated as identity: at inference the sampled-noise
regularizer is disabled by convention (and the default config has
use_dropout=False).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from innfer_tpu.models import common as C
from innfer_tpu.models.base import ModelDef
from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R


def build(cfg: Dict[str, Any]) -> ModelDef:
    num_downs = int(cfg.get("num_downs", 8))
    norm_type = cfg.get("norm_type", "batch")
    upsample_mode = cfg.get("upsample_mode", "deconv")
    meval = bool(cfg.get("meval", False))  # pix2pix preset: train-mode BN
    if bool(cfg.get("use_dropout", False)) and not meval:
        C.warn_train_dropout("unet")

    if norm_type in ("BN", "batch"):
        is_instance = False
    elif norm_type in ("IN", "instance"):
        is_instance = True
    else:
        raise NotImplementedError(f"Unknown norm layer [{norm_type}]")

    prefixes: List[str] = []
    pre = "model.model"
    for l in range(num_downs):
        prefixes.append(pre)
        pre = pre + (".1.model" if l == 0 else ".3.model")

    def norm(params, x, key):
        if is_instance:
            return F.instance_norm(x)
        return F.batch_norm(
            x, params[f"{key}.weight"], params[f"{key}.bias"],
            params.get(f"{key}.running_mean"), params.get(f"{key}.running_var"),
            training=not meval,
        )

    def down_conv(params, x, key):
        return F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"),
                        stride=2, padding=1)

    def up_conv(params, x, key):
        if upsample_mode == "deconv":
            return F.conv_transpose2d(
                x, params[f"{key}.weight"], params.get(f"{key}.bias"),
                stride=2, padding=1, output_padding=0,
            )
        # 'upconv': Sequential(Upsample-nearest-2x, conv3x3) at one index
        h = R.upsample_nearest(x, 2)
        return F.conv2d(h, params[f"{key}.1.weight"], params.get(f"{key}.1.bias"),
                        padding=1)

    def block(params, x, l: int):
        p = prefixes[l]
        if l == 0:
            h = down_conv(params, x, f"{p}.0")
            h = block(params, h, 1)
            h = F.relu(h)
            h = up_conv(params, h, f"{p}.3")
            return F.tanh(h)
        if l == num_downs - 1:  # innermost
            h = F.leaky_relu(x, 0.2)
            h = down_conv(params, h, f"{p}.1")
            h = F.relu(h)
            h = up_conv(params, h, f"{p}.3")
            h = norm(params, h, f"{p}.4")
            return jnp.concatenate([x, h], axis=-1)
        h = F.leaky_relu(x, 0.2)
        h = down_conv(params, h, f"{p}.1")
        h = norm(params, h, f"{p}.2")
        h = block(params, h, l + 1)
        h = F.relu(h)
        h = up_conv(params, h, f"{p}.5")
        h = norm(params, h, f"{p}.6")
        return jnp.concatenate([x, h], axis=-1)

    def apply(params, x: jax.Array) -> jax.Array:
        return block(params, x, 0)

    transposed: Tuple[str, ...] = ()
    if upsample_mode == "deconv":
        keys = []
        for l, p in enumerate(prefixes):
            idx = 3 if (l == 0 or l == num_downs - 1) else 5
            keys.append(rf"{p.replace('.', chr(92) + '.')}\.{idx}\.weight")
        transposed = tuple(keys)

    return ModelDef(
        name="unet_net",
        cfg=dict(cfg),
        apply=apply,
        scale=1,
        transposed_keys=transposed,
        ignore_key_patterns=(r".*num_batches_tracked",),
    )
