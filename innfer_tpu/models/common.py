"""Shared pieces of the flattened-sequential SR skeleton.

RRDBNet, SRResNet and PPON all share the traiNNer "flattened nn.Sequential"
macro-structure (fea conv -> trunk-with-global-skip -> upsample chain ->
HR convs; reference RRDBNet_arch.py:47-48, SRResNet_arch.py:44-45,
PPON_arch.py:52-63), with parameter keys given by positional indices.  The
helpers here compute those indices and apply the upsample blocks.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R

Params = dict


def n_upscale_blocks(upscale: int) -> Tuple[int, int]:
    """Number of upsample blocks and the per-block factor.

    2^k scales use k blocks of 2x; scale 3 uses one 3x block; scale 1 none.
    (reference RRDBNet_arch.py:21-23)
    """
    if upscale == 3:
        return 1, 3
    if upscale == 1:
        return 0, 2
    return int(math.log2(upscale)), 2


def upsample_indices(upscale: int, mode: str, start: int = 2) -> Tuple[List[int], int]:
    """Positional indices of the conv inside each upsample block, plus the
    index of the first HR conv, matching the flattened Sequential layout.

    upconv block      = [Upsample, Conv, Act]  -> conv at i+1, next at i+3
    pixelshuffle block = [Conv, PixelShuffle, Act] -> conv at i, next at i+3
    """
    n_up, _factor = n_upscale_blocks(upscale)
    conv_idxs = []
    i = start
    for _ in range(n_up):
        conv_idxs.append(i + 1 if mode == "upconv" else i)
        i += 3
    return conv_idxs, i


def collapse_upconv_weight(w: jax.Array, b, factor: int):
    """Rewrite a nearest-up(x r) + 3x3/pad-1 conv as an LR conv + shuffle.

    The reference upconv block (block.py:348-361) nearest-upsamples then
    convolves at HR.  Because the upsampled image is piecewise constant,
    each HR output phase (a, b) in [0, r)^2 only ever reads LR pixels at
    offsets in {-1, 0, +1}: tap dp of the 3x3 kernel lands on LR offset
    floor((a+dp)/r), so per phase the HR taps COLLAPSE (summed) onto a 3x3
    LR kernel.  The whole block is then exactly

        PixelShuffle(conv2d(x, w', b', padding=1), r)

    with w' of shape (3, 3, cin, cout*r^2) (phase kernels interleaved in
    PixelShuffle channel order c*r^2 + a*r + b) and b' = repeat(b, r^2).
    HR zero padding maps to LR zero padding bit-for-bit (the only taps that
    reach LR offset -1/+1 are the ones that cross the HR border).  Keeps
    activations at LR (4x less conv traffic at r=2) and widens Cout for the
    MXU; numerics differ from the HR form only by pre-summing kernel taps
    (~1e-7 rel in fp32).  This is the resize-convolution == constrained
    sub-pixel-convolution identity (arXiv:1707.02937) run in reverse; the
    weight rewrite executes inside the traced forward (one tiny einsum on
    the kernel, ~negligible next to the convs it feeds) so checkpoints keep
    their torch key layout."""
    import numpy as np

    r = factor
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    # S[a, P, t]: HR tap t (dp = t-1) of phase a lands on LR offset P-1
    sel = np.zeros((r, 3, 3), np.float32)
    for a in range(r):
        for t, dp in enumerate((-1, 0, 1)):
            p = -1 if a + dp < 0 else (1 if a + dp >= r else 0)
            sel[a, p + 1, t] = 1.0
    # pre-sum taps in fp32: with bf16 params the per-phase sums would
    # round to bf16 BEFORE the conv, an extra rounding step the HR form
    # doesn't have; one final cast keeps the collapse exact to 1 rounding
    s = jnp.asarray(sel, jnp.float32)
    # (p,q,i,o,a,b) -> reshape collapses (o,a,b) into o*r^2 + a*r + b,
    # exactly PixelShuffle's channel order
    w2 = jnp.einsum("apd,bqe,deio->pqioab", s, s, w.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    w2 = w2.reshape(3, 3, cin, cout * r * r).astype(w.dtype)
    b2 = None if b is None else jnp.repeat(b, r * r)
    return w2, b2


def apply_upsample_block(
    params: Params, x: jax.Array, key: str, *, mode: str, factor: int,
    act_type: str, act_key: str = "",
) -> jax.Array:
    """One upsample block (upconv: nearest-resize+conv+act, reference
    block.py:348-361; pixelshuffle: conv+shuffle+act, block.py:333-346).

    ``act_key`` is the positional prefix of the act submodule, needed when
    the activation carries parameters (prelu weight / swish beta)."""
    if mode == "upconv":
        w = params[f"{key}.weight"]
        if w.shape[0] == 3 and w.shape[1] == 3 and factor > 1:
            # LR-collapsed form (see collapse_upconv_weight): exact, cheaper
            w2, b2 = collapse_upconv_weight(
                w, params.get(f"{key}.bias"), factor)
            x = F.conv2d(x, w2, b2, padding=1)
            x = F.pixel_shuffle(x, factor)
        else:
            x = R.upsample_nearest(x, factor)
            x = F.conv2d(x, params[f"{key}.weight"],
                         params.get(f"{key}.bias"), padding=1)
        return F.act(act_type, x, params=params, key=act_key)
    if mode == "pixelshuffle":
        x = F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"), padding=1)
        x = F.pixel_shuffle(x, factor)
        return F.act(act_type, x, params=params, key=act_key)
    raise NotImplementedError(f"upsample mode [{mode}] is not found")


def conv3x3(params: Params, x: jax.Array, key: str) -> jax.Array:
    return F.conv2d(x, params[f"{key}.weight"], params.get(f"{key}.bias"), padding=1)


_PHASE_SAFE_ACTS = (None, "relu", "leakyrelu", "lrelu", "tanh", "sigmoid")


def phase_tail_ok(params: Params, up_key: str, *, factor: int, up_mode: str,
                  act_type, finalact) -> bool:
    """Whether the tail (last upsample block + HR convs) can run in phase
    space (see nn/phase.py): per-block factor 2, a 3x3 last-block conv,
    and parameter-free activations (parameterized acts carry per-channel
    state that the phase-major layout would need to re-plumb).

    Phase is the only eligible-path policy: exact (maxabs 0.0 vs the
    materialized tail) and faster on-chip (19.66 vs 19.35 MP/s headline,
    tools/out/phase_tail_ab.json, 2026-08-19).  Tests force the
    materialized path by monkeypatching this predicate."""
    if factor != 2 or up_mode not in ("upconv", "pixelshuffle"):
        return False
    if act_type not in _PHASE_SAFE_ACTS or finalact not in _PHASE_SAFE_ACTS:
        return False
    w = params.get(f"{up_key}.weight")
    return w is not None and w.ndim == 4 and w.shape[:2] == (3, 3)


def apply_phase_tail(
    params: Params, h: jax.Array, *, up_key: str, up_mode: str,
    act_type, hr0: int, finalact, out_prefix: str = "model",
) -> jax.Array:
    """The SR tail — last upsample block, act, HR conv, act, conv_last,
    optional finalact — evaluated entirely in phase space at the
    half-resolution grid, with one final 3-channel depth-to-space.

    Exact reformulation of the materialized tail (same taps, fp32
    accumulation order differs; see nn/phase.py).  Avoids both HR-
    resolution 3x3 convs (nf channels at scale^2 spatial — the worst
    MXU shapes in the model) and two full-size pixel-shuffle
    materializations.  Reference semantics: RRDBNet_arch.py:40-48 /
    SRResNet_arch.py:44-45 tail order.
    """
    from innfer_tpu.nn import phase as PH

    r = 2
    w = params[f"{up_key}.weight"]
    b = params.get(f"{up_key}.bias")
    if up_mode == "upconv":
        w2, _ = collapse_upconv_weight(w, None, r)
        w2 = PH.cmajor_to_phase_major(w2, r)
        p = F.conv2d(h, w2, PH.phase_bias(b, r), padding=1)
    else:  # pixelshuffle: the conv's channels are already per-phase
        p = F.conv2d(h, PH.cmajor_to_phase_major(w, r),
                     PH.cmajor_bias_to_phase_major(b, r), padding=1)
    p = F.act(act_type, p)
    p = PH.phase_conv3x3(
        p, params[f"{out_prefix}.{hr0}.weight"],
        params.get(f"{out_prefix}.{hr0}.bias"), r)
    p = F.act(act_type, p)
    p = PH.phase_conv3x3(
        p, params[f"{out_prefix}.{hr0 + 2}.weight"],
        params.get(f"{out_prefix}.{hr0 + 2}.bias"), r)
    if finalact:
        p = F.act(finalact, p)
    return PH.phase_shuffle_out(p, r)


# ---------------------------------------------------------------------------
# Reference conv_block semantics (mode CNA | NAC | CNAC, norm, act, pad)
# ---------------------------------------------------------------------------

def warn_train_dropout(arch: str) -> None:
    """Loud one-time note that deterministic inference diverges from the
    reference's stochastic train-mode dropout (block.py Dropout(0.5))."""
    import warnings

    warnings.warn(
        f"{arch} generator with use_dropout=True in train mode: the "
        "reference samples Dropout(0.5) stochastically; this framework "
        "is deterministic and treats dropout as identity, so outputs "
        "will differ from the reference's random draws")


def conv_block_layout(mode: str = "CNA", norm_type=None, act_type=None,
                      pad_type: str = "zero") -> List[str]:
    """Positional submodule kinds of a reference ``conv_block``.

    Mirrors block.py:213-254: CNA/CNAC order is [pad?, conv, norm?, act?];
    NAC order is [norm?, act?, pad?, conv].  Zero padding is folded into the
    conv (no pad module); 'none' norm contributes no module.  The returned
    list gives the state-dict positional indices torch's nn.Sequential
    assigns (parameterless modules still consume an index).
    """
    mode = (mode or "CNA").upper()
    if mode not in ("CNA", "NAC", "CNAC"):
        raise NotImplementedError(f"Wrong conv mode [{mode}]")
    has_pad = pad_type not in (None, "zero")
    has_norm = norm_type not in (None, "none")
    has_act = act_type is not None
    if mode == "NAC":
        order = (("norm", has_norm), ("act", has_act), ("pad", has_pad),
                 ("conv", True))
    else:
        order = (("pad", has_pad), ("conv", True), ("norm", has_norm),
                 ("act", has_act))
    return [kind for kind, on in order if on]


def apply_conv_block(params: Params, x: jax.Array, key_of, *,
                     mode: str = "CNA", norm_type=None, act_type=None,
                     pad_type: str = "zero", padding: int = 1,
                     stride: int = 1, bn_training: bool = False,
                     neg_slope: float = 0.2) -> jax.Array:
    """Apply one reference-semantics conv_block.

    ``key_of(i)`` maps the positional submodule index to its state-dict
    prefix — nested call sites use ``f"{key}.{i}"`` (torch wraps the block in
    its own Sequential); flattened call sites (the trunk/top-level
    ``B.sequential`` which unwraps children, block.py:256-270) pass the
    parent positional index.
    """
    layout = conv_block_layout(mode, norm_type, act_type, pad_type)
    for i, kind in enumerate(layout):
        k = key_of(i)
        if kind == "pad":
            x = F.pad2d(x, padding, mode=pad_type)
        elif kind == "conv":
            pad_amt = padding if pad_type in (None, "zero") else 0
            x = F.conv2d(x, params[f"{k}.weight"], params.get(f"{k}.bias"),
                         stride=stride, padding=pad_amt)
        elif kind == "norm":
            nt = str(norm_type).lower()
            if nt == "batch":
                x = F.batch_norm(
                    x, params[f"{k}.weight"], params[f"{k}.bias"],
                    params.get(f"{k}.running_mean"),
                    params.get(f"{k}.running_var"), training=bn_training)
            elif nt == "instance":
                x = F.instance_norm(x)
            else:
                raise NotImplementedError(
                    f"normalization layer [{norm_type}] is not found")
        else:  # act
            # NAC without norm recreates the act out-of-place
            # (block.py:247-252) — the only inplace=False site
            inplace = not (mode.upper() == "NAC"
                           and norm_type in (None, "none"))
            x = F.act(act_type, x, neg_slope=neg_slope, params=params,
                      key=k, inplace=inplace)
    return x


def _outm(x, outm):
    """Optional output cap (reference RRDBNet_arch.py:50-62 forward outm):
    scaltanh | tanh | sigmoid | clamp | None."""
    import jax.numpy as jnp

    if outm == "scaltanh":
        return (jnp.tanh(x) + 1.0) / 2.0
    if outm == "tanh":
        return jnp.tanh(x)
    if outm == "sigmoid":
        return F.sigmoid(x)
    if outm == "clamp":
        return jnp.clip(x, 0.0, 1.0)
    return x
