"""State-dict remap passes: SWA unwrap and old/new RRDB key-layout conversion.

Behavioral equivalents of the reference's converters
(/root/reference/utils/utils.py:629-720), operating on ``{key: ndarray}``
dicts from ``torch_pickle.load_checkpoint``.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

StateDict = Dict[str, np.ndarray]


def swa_to_normal(state: StateDict) -> StateDict:
    """Unwrap an AveragedModel (SWA) checkpoint.

    Drops ``n_averaged`` and keeps only keys under the ``module.module.``
    prefix, stripped (reference utils.py:701-720 keeps nothing else).
    """
    if "n_averaged" not in state:
        return state
    out: StateDict = {}
    for k, v in state.items():
        if "n_averaged" in k:
            continue
        if "module.module." in k:
            out[k.replace("module.module.", "")] = v
    return out


_TRUNK_IDX = re.compile(r"^RRDB_trunk\.(\d+)\.")


def mod_to_normal(state: StateDict) -> StateDict:
    """Convert the modified/"new" RRDB layout (mesrgan, named submodules) to
    the flattened sequential ESRGAN layout (reference utils.py:666-698).

    The reference hard-codes the trunk conv at ``model.1.sub.23`` (assuming
    nb=23); here the index is derived from the actual trunk depth so
    checkpoints with any nb convert correctly (equal behavior at nb=23).
    """
    if "conv_first.weight" not in state:
        return state
    nb = 1 + max(
        (int(m.group(1)) for k in state if (m := _TRUNK_IDX.match(k))), default=-1
    )
    out: StateDict = {}
    direct = {
        "conv_first": "model.0",
        "trunk_conv": f"model.1.sub.{nb}",
        "upconv1": "model.3",
        "upconv2": "model.6",
        "HRconv": "model.8",
        "conv_last": "model.10",
    }
    for k, v in state.items():
        if "RDB" in k:
            nk = k.replace("RRDB_trunk.", "model.1.sub.")
            if nk.endswith(".weight"):
                nk = nk[: -len(".weight")] + ".0.weight"
            elif nk.endswith(".bias"):
                nk = nk[: -len(".bias")] + ".0.bias"
            out[nk] = v
            continue
        stem, _, leaf = k.rpartition(".")
        if stem in direct and leaf in ("weight", "bias"):
            out[f"{direct[stem]}.{leaf}"] = v
        # anything unrecognized is dropped, matching the reference converter
    return out


def normal_to_mod(state: StateDict) -> StateDict:
    """Inverse of :func:`mod_to_normal` (reference utils.py:629-663; unused
    by the reference CLI but part of the conversion toolbox)."""
    if "model.0.weight" not in state:
        return state
    sub_idx = re.compile(r"^model\.1\.sub\.(\d+)\.")
    nb = max(
        (int(m.group(1)) for k in state if "RDB" in k and (m := sub_idx.match(k))),
        default=-1,
    ) + 1
    out: StateDict = {}
    direct = {
        "model.0": "conv_first",
        f"model.1.sub.{nb}": "trunk_conv",
        "model.3": "upconv1",
        "model.6": "upconv2",
        "model.8": "HRconv",
        "model.10": "conv_last",
    }
    for k, v in state.items():
        if "RDB" in k:
            nk = k.replace("model.1.sub.", "RRDB_trunk.")
            nk = nk.replace(".0.weight", ".weight").replace(".0.bias", ".bias")
            out[nk] = v
            continue
        stem, _, leaf = k.rpartition(".")
        if stem in direct and leaf in ("weight", "bias"):
            out[f"{direct[stem]}.{leaf}"] = v
    return out
