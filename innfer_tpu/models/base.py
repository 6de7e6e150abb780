"""Model definition container + torch-state-dict -> TPU-params conversion.

Every architecture module exposes ``build(cfg) -> ModelDef``.  A ModelDef is
a pure ``apply(params, x)`` function over a flat parameter dict plus the
metadata the converter needs to map torch tensors into TPU-native layouts:

  * plain Conv2d weights  (O, I, kh, kw)  ->  HWIO (kh, kw, I, O)
  * Conv3d weights (O, I, kd, kh, kw) -> DHWIO (evsrgan)
  * ConvTranspose2d weights (I, O, kh, kw) -> spatially flipped HWIO
    (kh, kw, I, O) so the transposed conv runs as an input-dilated conv
    (see innfer_tpu.nn.functional.conv_transpose2d)
  * 1x1 Conv1d weights (O, I, 1) -> dense (I, O)
  * 1D/0D tensors (biases, norm affine/stats, PReLU/gamma) -> unchanged

Parameter keys keep their torch names so checkpoint parity is auditable
key-by-key against the reference loader (/root/reference/run.py:93).
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]
StateDict = Dict[str, np.ndarray]


class ParamDict(dict):
    """Parameter dict whose missing-key error explains the likely cause.

    A bare KeyError('model.0.weight') at trace time is what a user sees
    when an EXPLICIT arch config does not match the checkpoint (e.g.
    `-a ppon` falls back to library defaults nb=24 against an nb=2 file —
    same behavior as the reference, run.py:157-163, which crashes in
    load_state_dict instead).  Point at the fix."""

    def __missing__(self, key):
        raise KeyError(
            f"parameter '{key}' is not in the checkpoint ({len(self)} keys"
            " loaded).  The network config does not match the checkpoint —"
            " an explicit -a/--arch uses library-default hyperparameters"
            " (nb/nf/...); try arch auto-detection (-a infer, the default)"
            " or pass the exact config.")


# Registered like a plain dict (sorted-key flattening, jax's own dict
# convention) so ParamDict passes through jit/device_put as a pytree
# instead of an opaque leaf.
jax.tree_util.register_pytree_node(
    ParamDict,
    lambda d: (tuple(d[k] for k in sorted(d)), tuple(sorted(d))),
    lambda keys, vals: ParamDict(zip(keys, vals)),
)


@dataclass
class ModelDef:
    """A compiled-architecture description: pure apply + conversion metadata."""

    name: str
    cfg: Dict[str, Any]
    apply: Callable[[Params, jax.Array], jax.Array]
    scale: int = 1
    # regex patterns (fullmatch on the key stem) of ConvTranspose2d weights
    transposed_keys: Tuple[str, ...] = ()
    # regex patterns of Conv1d-as-dense weights
    dense_keys: Tuple[str, ...] = ()
    # keys expected to be missing/extra under non-strict loading (e.g. old
    # InstanceNorm running stats in CycleGAN checkpoints, run.py:305-309)
    ignore_key_patterns: Tuple[str, ...] = ()
    # state-dict preprocessing (e.g. mesrgan -> flattened esrgan remap)
    remap: Optional[Callable[[StateDict], StateDict]] = None
    # multi-output models (PPON) select this output index at inference
    output_index: Optional[int] = None
    # preferred tile-dimension multiple for the tiling planner (e.g. 64 so
    # the fused Pallas RDB can pick >=64 kernel blocks); 1 = no preference
    tile_quantum: int = 1
    # True when the model REQUIRES quantum-aligned tiles (explicit
    # backend='pallas' opt-in): the planner must not fall back to the fine
    # grid on cost grounds, or the kernel gate would reject the tiles
    tile_quantum_strict: bool = False
    # Optional trunk/tail split for hybrid inference (whole-image trunk,
    # tiled tail — engine.hybrid_apply): apply == apply_tail(apply_trunk).
    # tail_halo is the tail's receptive radius in INPUT pixels (the tail
    # tile overlap must exceed it for seam-exactness).
    apply_trunk: Optional[Callable[[Params, jax.Array], jax.Array]] = None
    apply_tail: Optional[Callable[[Params, jax.Array], jax.Array]] = None
    tail_halo: int = 0


def _matches(patterns: Sequence[str], key: str) -> bool:
    return any(re.fullmatch(p, key) for p in patterns)


def convert_state(
    model: ModelDef,
    state: StateDict,
    *,
    param_dtype=jnp.float32,
    strict: bool = True,
) -> Params:
    """Convert a torch state dict into this model's TPU-native param dict.

    ``strict=False`` mirrors the reference's non-strict loading for CycleGAN
    checkpoints: keys matching ``ignore_key_patterns`` are dropped instead of
    raising (run.py:305-309, ResNet_arch.py:33-36).
    """
    if model.remap is not None:
        state = model.remap(state)
    params: Params = ParamDict()
    for key, val in state.items():
        arr = np.asarray(val)
        if arr.ndim == 4:
            if _matches(model.transposed_keys, key):
                arr = np.transpose(arr[:, :, ::-1, ::-1], (2, 3, 0, 1))
            else:
                arr = np.transpose(arr, (2, 3, 1, 0))
        elif arr.ndim == 5:
            # Conv3d (O, I, kd, kh, kw) -> DHWIO (evsrgan video RRDB)
            arr = np.transpose(arr, (2, 3, 4, 1, 0))
        elif arr.ndim == 3 and arr.shape[-1] == 1 and _matches(model.dense_keys, key):
            arr = np.ascontiguousarray(arr[:, :, 0].T)
        if not strict and _matches(model.ignore_key_patterns, key):
            continue
        # norm statistics and scalars stay fp32 for numerical fidelity
        keep_f32 = arr.ndim <= 1
        params[key] = jnp.asarray(
            np.ascontiguousarray(arr),
            dtype=jnp.float32 if keep_f32 else param_dtype,
        )
    return params


def cast_params(params: Params, dtype) -> Params:
    """Cast all >=2D params to ``dtype`` (biases/stats stay fp32).

    Returns a ParamDict so a config/checkpoint key mismatch at trace time
    keeps the actionable ``__missing__`` diagnostic instead of degrading
    to a bare KeyError after a cast."""
    return ParamDict(
        (k, v if v.ndim <= 1 else v.astype(dtype)) for k, v in params.items()
    )
