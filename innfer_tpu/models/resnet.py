"""CycleGAN ResNet generator in pure JAX, NHWC.

Parity target: /root/reference/architectures/ResNet_arch.py:11-151 with
library defaults (instance norm, reflect padding, deconv upsampling;
utils/defaults.py:123-140): ReflectionPad(3) + 7x7 conv -> 2 stride-2 downs
-> n_blocks reflect-padded residual blocks -> 2 transposed-conv ups ->
ReflectionPad(3) + 7x7 conv -> Tanh.

Pre-0.4 InstanceNorm checkpoints carry running_mean/running_var keys that
inference ignores; non-strict loading drops them (run.py:305-309,
ResNet_arch.py:33-36) — see ``ignore_key_patterns``.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax

from innfer_tpu.models import common as C
from innfer_tpu.models.base import ModelDef
from innfer_tpu.nn import functional as F

_PAD_MODES = {"reflect": "reflect", "replicate": "replicate", "zero": "zero"}


def build(cfg: Dict[str, Any]) -> ModelDef:
    n_blocks = int(cfg.get("n_blocks", 9))
    norm_type = cfg.get("norm_type", "instance")
    pad_type = cfg.get("padding_type", "reflect")
    upsample_mode = cfg.get("upsample_mode", "deconv")
    if norm_type in ("IN", "instance"):
        use_bias, is_instance = True, True
    elif norm_type in ("BN", "batch"):
        use_bias, is_instance = False, False
    else:
        raise NotImplementedError(f"norm [{norm_type}] for resnet generator")
    if pad_type not in _PAD_MODES:
        raise NotImplementedError(f"padding [{pad_type}] is not implemented")

    # train-mode BN for presets that keep the net in train() (pipeline sets
    # cfg['meval']=False and rebuilds; mirrors unet.py and run.py:299-309)
    meval = bool(cfg.get("meval", True))
    use_dropout = bool(cfg.get("use_dropout", False))
    if use_dropout and not meval:
        C.warn_train_dropout("resnet")

    def norm(params, x, key):
        if is_instance:
            return F.instance_norm(x)
        return F.batch_norm(
            x, params[f"{key}.weight"], params[f"{key}.bias"],
            params.get(f"{key}.running_mean"), params.get(f"{key}.running_var"),
            training=not meval,
        )

    def conv(params, x, key, *, k, stride=1, pad=0):
        return F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"),
                        stride=stride, padding=pad)

    # ResnetBlock conv_block indices depend on padding_type ('zero' omits
    # the pad modules) and use_dropout (Dropout after the first relu shifts
    # the second half); reference ResNet_arch.py build_conv_block.
    has_pad = pad_type != "zero"
    i_conv1 = 1 if has_pad else 0
    i_conv2 = i_conv1 + 3 + int(use_dropout) + int(has_pad)

    # 'pallas' opts into the fused whole-block kernel.  NOT auto-enabled:
    # the systematic tiled sweep (tools/cg_tiled_ab.py ->
    # tools/out/cg_tiled_ab.json) measured it within noise of XLA at every
    # tiled config (434.8 vs 424.0 ms at tile 256 / 1 group, 458.0 vs
    # 440.3 at tile 192 / 2 groups, ...): CycleGAN at these slab sizes is
    # bound by this backend's per-launch/dispatch floor, not by the HBM
    # passes the fusion removes, so the kernel buys nothing in-product.
    # (An earlier one-off ~9x slowdown at tile 192 did NOT reproduce in
    # the sweep.)  Kept for backends where the floor is lower.
    backend = cfg.get("backend", "xla")  # xla | pallas

    def res_block(params, x, prefix):
        if backend == "pallas" and is_instance and pad_type == "reflect":
            # fused whole-block Pallas kernel (ops/pallas/resnet_block.py):
            # conv+IN+relu+conv+IN+residual in one VMEM-resident pass.
            # Dropout sits between the halves but is inference-identity,
            # so it never blocks the fusion.
            from innfer_tpu.ops.pallas.resnet_block import (
                fused_resnet_block, slab_ok)

            if slab_ok(x.shape, x.dtype):
                return fused_resnet_block(
                    x,
                    params[f"{prefix}.conv_block.{i_conv1}.weight"],
                    params.get(f"{prefix}.conv_block.{i_conv1}.bias"),
                    params[f"{prefix}.conv_block.{i_conv2}.weight"],
                    params.get(f"{prefix}.conv_block.{i_conv2}.bias"),
                )
        p = 0 if has_pad else 1
        h = x
        if has_pad:
            h = F.pad2d(h, 1, mode=_PAD_MODES[pad_type])
        h = conv(params, h, f"{prefix}.conv_block.{i_conv1}", k=3, pad=p)
        h = norm(params, h, f"{prefix}.conv_block.{i_conv1 + 1}")
        h = F.relu(h)
        # dropout (inference): identity in eval; warned above for train mode
        if has_pad:
            h = F.pad2d(h, 1, mode=_PAD_MODES[pad_type])
        h = conv(params, h, f"{prefix}.conv_block.{i_conv2}", k=3, pad=p)
        h = norm(params, h, f"{prefix}.conv_block.{i_conv2 + 1}")
        return x + h

    # flattened Sequential indices (see module docstring layout)
    i_up0 = 10 + n_blocks
    i_up1 = i_up0 + 3
    i_out = i_up1 + 4  # pad at i_up1+3, conv at +4

    transposed: List[str] = []
    if upsample_mode == "deconv":
        transposed = [rf"model\.{i_up0}\.weight", rf"model\.{i_up1}\.weight"]

    def upsample(params, x, idx):
        if upsample_mode == "deconv":
            return F.conv_transpose2d(
                x, params[f"model.{idx}.weight"], params.get(f"model.{idx}.bias"),
                stride=2, padding=1, output_padding=1,
            )
        # 'upconv': Sequential(Upsample, conv) -> conv key at .1
        from innfer_tpu.nn import resize as R

        h = R.upsample_nearest(x, 2)
        return F.conv2d(h, params[f"model.{idx}.1.weight"],
                        params.get(f"model.{idx}.1.bias"), padding=1)

    def apply(params, x: jax.Array) -> jax.Array:
        # outer ReflectionPad2d(3) is hardcoded reflect in the reference
        # regardless of padding_type (ResNet_arch.py:53,85)
        h = F.pad2d(x, 3, mode="reflect")
        h = conv(params, h, "model.1", k=7)
        h = norm(params, h, "model.2")
        h = F.relu(h)
        for d, idx in enumerate((4, 7)):
            h = conv(params, h, f"model.{idx}", k=3, stride=2, pad=1)
            h = norm(params, h, f"model.{idx + 1}")
            h = F.relu(h)
        for i in range(n_blocks):
            h = res_block(params, h, f"model.{10 + i}")
        for idx in (i_up0, i_up1):
            h = upsample(params, h, idx)
            h = norm(params, h, f"model.{idx + 1}")
            h = F.relu(h)
        h = F.pad2d(h, 3, mode="reflect")
        h = conv(params, h, f"model.{i_out}", k=7)
        return F.tanh(h)

    # ask the planner for 64-multiple tile dims when the fused ResnetBlock
    # can fire (slab = tile/4 then has 16-multiple width; see slab_ok)
    quantum = 64 if (backend == "pallas" and is_instance
                     and pad_type == "reflect") else 1
    return ModelDef(
        name="resnet_net",
        cfg=dict(cfg),
        apply=apply,
        scale=1,
        transposed_keys=tuple(transposed),
        # running stats are vestigial ONLY for instance norm (pre-0.4 IN
        # checkpoints carry them; torch IN without track_running_stats
        # ignores them on load) — batch-norm generators NEED them in eval,
        # where dropping them would silently fall back to per-image stats
        ignore_key_patterns=(
            (r".*running_(mean|var)", r".*num_batches_tracked")
            if is_instance else (r".*num_batches_tracked",)),
        tile_quantum=quantum,
    )
