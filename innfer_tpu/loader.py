"""High-level model loading: .pth path -> (ModelDef, TPU params).

TPU-native equivalent of the reference's Model.load_model
(/root/reference/run.py:39-101): torch-free checkpoint read, SWA unwrap,
arch fingerprinting / param inference (or explicit arch), network build,
and state-dict -> NHWC/HWIO parameter conversion.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from innfer_tpu.checkpoint.detect import detect_and_infer
from innfer_tpu.checkpoint.remaps import swa_to_normal
from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
from innfer_tpu.config.defaults import get_network_config
from innfer_tpu.models import ModelDef, Params, convert_state, get_network


def load_model(
    path: str,
    arch: str = "infer",
    scale: Optional[int] = None,
    *,
    strict: bool = True,
    param_dtype=jnp.float32,
) -> Tuple[ModelDef, Params]:
    """Load a checkpoint and build the matching JAX model.

    ``arch='infer'`` auto-detects the architecture from state-dict key
    fingerprints and recovers nb/nf/scale from shapes (run.py:50-73);
    otherwise ``arch`` is a type alias resolved through the config
    normalizer with library defaults (run.py:74-87).
    """
    state = load_checkpoint(path)
    state = swa_to_normal(state)

    if arch == "infer":
        _family, cfg, state = detect_and_infer(state, scale=scale)
    else:
        net_dict: Dict[str, Any] = {}
        if "wbcunet" in arch and "_tf" in arch:
            arch = arch.replace("_tf", "")
            net_dict["mode"] = "tf"
        elif "wbcunet" in arch:
            net_dict["mode"] = "pt"
        net_dict["type"] = arch
        cfg = get_network_config(net_dict, scale if scale else 1)

    model = get_network(cfg)
    params = convert_state(model, state, param_dtype=param_dtype, strict=strict)
    return model, params


def load_model_from_state(
    state: Dict[str, Any],
    cfg: Dict[str, Any],
    *,
    strict: bool = True,
    param_dtype=jnp.float32,
) -> Tuple[ModelDef, Params]:
    """Build from an already-loaded state dict + full config (tests, tools)."""
    model = get_network(cfg)
    params = convert_state(model, state, param_dtype=param_dtype, strict=strict)
    return model, params
