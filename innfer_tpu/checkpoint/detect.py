"""Architecture fingerprinting and hyperparameter inference from state dicts.

Behavioral equivalent of the reference's auto-detection
(/root/reference/run.py:50-165): identify the architecture family from key
fingerprints, then recover nb/nf/scale/in_nc/out_nc (and the ESRGAN+ flag)
from key names and weight shapes, finally filling remaining defaults via
``innfer_tpu.config.defaults.get_network_config``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from innfer_tpu.checkpoint.remaps import mod_to_normal
from innfer_tpu.config.defaults import get_network_config

StateDict = Dict[str, np.ndarray]


def fingerprint_arch(state: StateDict) -> Tuple[str, StateDict]:
    """Detect the arch family; converts mesrgan-layout dicts to the
    flattened esrgan layout as a side effect (like the reference does).

    Fingerprint order matches run.py:50-72 exactly.
    """
    if "SCPA_trunk.0.conv1_a.weight" in state:
        return "pan", state
    if "model.1.sub.0.res.0.weight" in state:
        return "srgan", state
    if "conv_first.weight" in state:
        return "esrgan", mod_to_normal(state)
    if "model.0.weight" in state:
        return "esrgan", state
    if "CFEM.0.weight" in state:
        return "ppon", state
    if "conv_9.weight" in state:
        return "wbcunet", state
    raise ValueError("Could not infer model parameters from state-dict keys.")


def infer_params(arch: str, state: StateDict, scale: Optional[int] = None,
                 in_nc: int = 3, out_nc: int = 3) -> Dict[str, Any]:
    """Recover hyperparameters from the state dict (run.py:103-165).

    For esrgan/srgan (flattened sequential layout):
      * nb    = max ``model.1.sub.<i>`` block index
      * scale = 2 ** (count of ``model.<n>.weight`` convs with n > 6) —
        the reference's positional trick: for 2^k upsamplers the convs past
        index 6 are exactly the k-1 late upsample convs plus both HR convs.
      * out_nc from the highest-index conv weight, nf/in_nc from model.0.
      * plus  = any ``conv1x1`` key (ESRGAN+).
    """
    if arch in ("esrgan", "srgan"):
        scale2x = 0
        top_layer = 0
        nb = None
        plus = False
        for key in state:
            parts = key.split(".")
            if len(parts) == 5 and parts[2] == "sub":
                nb = int(parts[3])
            elif len(parts) == 3:
                idx = int(parts[1])
                if idx > 6 and parts[0] == "model" and parts[2] == "weight":
                    scale2x += 1
                if idx > top_layer:
                    top_layer = idx
                    out_nc = int(state[key].shape[0])
            if arch == "esrgan" and not plus and "conv1x1" in key:
                plus = True
        nf = int(state["model.0.weight"].shape[0])
        in_nc = int(state["model.0.weight"].shape[1])
        scale = 2 ** scale2x
        net = {"type": arch, "in_nc": in_nc, "out_nc": out_nc, "nf": nf, "nb": nb}
        if arch == "esrgan":
            net["plus"] = plus
    elif arch == "wbcunet":
        scale = 1
        net = {"type": arch, "mode": "pt", "nf": int(state["conv.weight"].shape[0])}
    elif arch in ("ppon", "pan"):
        # like the reference, fall back to library defaults for these
        net = {"type": arch, "in_nc": in_nc, "out_nc": out_nc}
    else:
        raise ValueError(f"cannot infer params for arch [{arch}]")

    return get_network_config(net, scale if scale else 1)


def detect_and_infer(state: StateDict, scale: Optional[int] = None) -> Tuple[str, Dict[str, Any], StateDict]:
    """Full auto path: fingerprint, then infer config.  Returns
    (arch_family, full_config, possibly-remapped state dict)."""
    arch, state = fingerprint_arch(state)
    cfg = infer_params(arch, state, scale=scale)
    return arch, cfg, state
