"""Architecture factory: full config dict -> ModelDef.

TPU-native equivalent of the reference factory
(/root/reference/architectures/__init__.py:5-40) over the same registered
types: sr_resnet, rrdb_net, mrrdb_net, ppon, pan_net, unet_net, resnet_net,
wbcunet_net.
"""
from __future__ import annotations

from typing import Any, Dict

from innfer_tpu.models.base import ModelDef, Params, convert_state, cast_params  # noqa: F401


def get_network(cfg: Dict[str, Any]) -> ModelDef:
    cfg = dict(cfg)
    kind = cfg.pop("type").lower()
    cfg["type"] = kind  # keep for ModelDef.cfg

    if kind == "rrdb_net":
        from innfer_tpu.models import rrdb

        return rrdb.build(cfg)
    if kind == "mrrdb_net":
        from innfer_tpu.models import rrdb

        return rrdb.build_mrrdb(cfg)
    if kind == "sr_resnet":
        from innfer_tpu.models import srresnet

        return srresnet.build(cfg)
    if kind == "ppon":
        from innfer_tpu.models import ppon

        return ppon.build(cfg)
    if kind == "pan_net":
        from innfer_tpu.models import pan

        return pan.build(cfg)
    if kind == "unet_net":
        from innfer_tpu.models import unet

        return unet.build(cfg)
    if kind == "resnet_net":
        from innfer_tpu.models import resnet

        return resnet.build(cfg)
    if kind == "wbcunet_net":
        from innfer_tpu.models import wbc

        return wbc.build(cfg)
    raise NotImplementedError(f"Model [{kind}] not recognized")
