"""RRDBNet (ESRGAN / ESRGAN+ / mESRGAN) in pure JAX, NHWC.

Architecture parity targets (reimplemented, not translated):
  * RRDBNet macro-structure: fea conv -> ShortcutBlock(nb x RRDB + LR conv)
    -> upsample chain -> HR convs (+ optional final act)
    (/root/reference/architectures/RRDBNet_arch.py:16-62)
  * RRDB = nr x ResidualDenseBlock_5C, out*0.2 + x (RRDBNet_arch.py:64-98)
  * RDB_5C = 5 dense-concat convs, ESRGAN+ conv1x1 cross-residuals,
    out*0.2 + x; GaussianNoise is train-only so omitted at inference
    (RRDBNet_arch.py:100-165, block.py:375-388)
  * mESRGAN ("modified" layout) checkpoints are converted to the flattened
    layout via remaps.mod_to_normal and run through this same forward —
    mathematically identical to MRRDBNet (RRDBNet_arch.py:173-198).

State-dict key layout is the flattened nn.Sequential naming the reference's
param inference walks (run.py:115-139): model.0 (fea), model.1.sub.<i> (RRDB
blocks), model.1.sub.<nb> (LR conv), positional upsample/HR convs after.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax

from innfer_tpu.checkpoint.remaps import mod_to_normal
from innfer_tpu.models import common as C
from innfer_tpu.models.base import ModelDef
from innfer_tpu.models.common import _outm
from innfer_tpu.nn import functional as F

import jax.numpy as jnp


def _rdb5c(params, x, prefix: str, *, act_type: str, plus: bool,
           norm_type=None, conv_fn=None):
    """Residual Dense Block (5 convs, dense concat growth, 0.2 residual).

    The RDB conv blocks always run in CNA order (RRDBNet passes mode='CNA'
    to its RRDBs, RRDBNet_arch.py:27), so conv5 carries no act; norm_type
    and parameterized activations (prelu/swish) are config-reachable.
    ``conv_fn(t, w, b)`` overrides the conv op (Conv3D for evsrgan).
    """
    cat = lambda *ts: jnp.concatenate(ts, axis=-1)
    simple = norm_type in (None, "none") and act_type in (
        "relu", "leakyrelu", "lrelu", "tanh", "sigmoid")
    if simple or conv_fn is not None:
        cf = conv_fn or (lambda t, w, b: F.conv2d(t, w, b, padding=1))
        conv = lambda i, t: cf(
            t, params[f"{prefix}.conv{i}.0.weight"],
            params.get(f"{prefix}.conv{i}.0.bias"))
        a = lambda t: F.act(act_type, t)
        cb = lambda i, t, act: a(conv(i, t)) if act else conv(i, t)
    else:
        def cb(i, t, act):
            return C.apply_conv_block(
                params, t, lambda j: f"{prefix}.conv{i}.{j}", mode="CNA",
                norm_type=norm_type, act_type=act_type if act else None)

    x1 = cb(1, x, True)
    x2 = cb(2, cat(x, x1), True)
    if plus:
        x2 = x2 + F.conv2d(x, params[f"{prefix}.conv1x1.weight"], None)
    x3 = cb(3, cat(x, x1, x2), True)
    x4 = cb(4, cat(x, x1, x2, x3), True)
    if plus:
        x4 = x4 + x2
    x5 = cb(5, cat(x, x1, x2, x3, x4), False)
    return x5 * jnp.asarray(0.2, x.dtype) + x


def _rdb5c_scatter(params, x, prefix: str, *, act_type: str, plus: bool):
    """Residual Dense Block with the convs regrouped BY SOURCE ("scatter"
    formulation) — mathematically identical to :func:`_rdb5c` but with
    MXU-friendly shapes on TPU.

    The reference computes conv_k over concat(x, x1..x_{k-1}) with 32 output
    channels (RRDBNet_arch.py:152-165).  Cout=32 pads to 128 MXU lanes, so
    XLA's conv emitter runs the trunk at ~25-30% peak.  Because each conv is
    linear in its input slices, the same math regroups as: for each SOURCE s
    (x, x1..x4), ONE conv whose output channels are the concatenation of
    source s's contributions to every LATER target (Cout = 192/160/128/96/64
    at nf=64, gc=32).  Contributions accumulate per-target in fp32 and each
    target's activation fires once all its sources have scattered.

    Numerics: differs from gather only by fp32 summation order (~1e-6 rel;
    golden parity tests pass on this path).  Perf on the tunneled v5e:
    measured 26 vs gather's 33 TF/s on the 69-RDB trunk — the fp32
    contribution buffers cost more HBM traffic than the wide-N MXU shapes
    save there, so 'auto' keeps the gather form and this is opt-in
    (backend='scatter').
    """
    nf = x.shape[-1]
    ws = [params[f"{prefix}.conv{k}.0.weight"] for k in range(1, 6)]
    bs = [params.get(f"{prefix}.conv{k}.0.bias") for k in range(1, 6)]
    gc = int(ws[0].shape[-1])
    sws = []
    for s in range(5):
        lo = 0 if s == 0 else nf + (s - 1) * gc
        width = nf if s == 0 else gc
        sws.append(jnp.concatenate(
            [ws[k][:, :, lo:lo + width, :] for k in range(s, 5)], axis=-1))

    pre = [None] * 5
    src = x
    x2 = None
    for s in range(5):
        contrib = F.conv2d(src, sws[s], padding=1, out_dtype=jnp.float32)
        off = 0
        for k in range(s, 5):
            width = gc if k < 4 else nf
            piece = jax.lax.slice_in_dim(contrib, off, off + width, axis=-1)
            pre[k] = piece if pre[k] is None else pre[k] + piece
            off += width
        if s < 4:
            p = pre[s] if bs[s] is None else pre[s] + bs[s].astype(jnp.float32)
            a = F.act(act_type, p).astype(x.dtype)
            if plus:
                # ESRGAN+ cross-residuals modify the post-activation SOURCES
                # x2 and x4 (RRDBNet_arch.py:155-160), so later targets see
                # the modified values.
                if s == 1:
                    a = a + F.conv2d(x, params[f"{prefix}.conv1x1.weight"],
                                     None)
                    x2 = a
                elif s == 3:
                    a = a + x2
            src = a
    p5 = pre[4] if bs[4] is None else pre[4] + bs[4].astype(jnp.float32)
    x5 = p5.astype(x.dtype)
    return x5 * jnp.asarray(0.2, x.dtype) + x


def _rdb5c_pallas(params, x, prefix: str, *, plus: bool):
    """Fused-Pallas RDB (see ops/pallas/rdb.py): used on TPU for square
    16-multiple tiles with the default leakyrelu/CNA/zero-pad config."""
    from innfer_tpu.ops.pallas.rdb import fused_rdb

    weights = [params[f"{prefix}.conv{c}.0.weight"] for c in range(1, 6)]
    biases = [params[f"{prefix}.conv{c}.0.bias"] for c in range(1, 6)]
    gc = int(weights[0].shape[-1])
    w1 = params.get(f"{prefix}.conv1x1.weight") if plus else None
    return fused_rdb(x, weights, biases, gc=gc, plus=plus, conv1x1_w=w1)


from innfer_tpu.ops.pallas import tile_pallas_fast as _tile_pallas_fast


def _use_pallas(x, act_type: str) -> bool:
    """'auto' resolves to the fused Pallas RDB when it is a proven win:
    bf16 activations on the TPU backend with tile dims that admit >=64
    kernel blocks.  fp32 stays on XLA (the kernel's fp32 VMEM footprint at
    big blocks is untested on the remote compiler); everything else falls
    back to XLA.  The tiling planner cooperates via ModelDef.tile_quantum."""
    if x.dtype != jnp.bfloat16:
        return False
    return _pallas_ok(x, act_type)


def _pallas_ok(x, act_type: str) -> bool:
    if act_type not in ("leakyrelu", "lrelu"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return x.ndim == 4 and _tile_pallas_fast(int(x.shape[1]),
                                             int(x.shape[2]))


def _rrdb(params, x, prefix: str, *, nr: int, act_type: str, plus: bool,
          backend: str = "auto", norm_type=None, conv_fn=None):
    simple = norm_type in (None, "none") and act_type in (
        "relu", "leakyrelu", "lrelu", "tanh", "sigmoid") and conv_fn is None
    # the fused kernel operates per-RDB, so it is nr-agnostic; nr != 3
    # checkpoints use 'RDBs.{i}' keys (reference RRDB with nr != 3)
    names = (("RDB1", "RDB2", "RDB3") if nr == 3
             else tuple(f"RDBs.{i}" for i in range(nr)))
    if backend == "pallas":
        if (not _pallas_ok(x, act_type) or norm_type not in (None, "none")
                or conv_fn is not None):
            raise ValueError(
                "backend='pallas' requires leakyrelu activation, no norm "
                "layers, Conv2D, and tile dims that admit >=64 kernel "
                "blocks (multiples of 64, or 64..128 in 16s) on TPU; "
                f"got act {act_type!r}, norm {norm_type!r}, shape {x.shape} "
                f"on {jax.default_backend()}"
            )
        fused = True
    else:
        fused = (backend == "auto" and conv_fn is None
                 and norm_type in (None, "none")
                 and _use_pallas(x, act_type)
                 and f"{prefix}.{names[0]}.conv1.0.bias" in params)
    if backend == "scatter" and not simple:
        raise ValueError(
            "backend='scatter' requires a parameter-free activation and no "
            f"norm layers; got act {act_type!r}, norm {norm_type!r}")
    # 'scatter' opts into the by-source regrouped formulation (see
    # _rdb5c_scatter: equivalent math, wide-N conv shapes); 'auto'/'xla'
    # keep the gather form, which measures faster on the current backend.
    scatter = backend == "scatter" and simple and not fused
    out = x
    for name in names:
        if fused:
            out = _rdb5c_pallas(params, out, f"{prefix}.{name}", plus=plus)
        elif scatter:
            out = _rdb5c_scatter(params, out, f"{prefix}.{name}",
                                 act_type=act_type, plus=plus)
        else:
            out = _rdb5c(params, out, f"{prefix}.{name}", act_type=act_type,
                         plus=plus, norm_type=norm_type, conv_fn=conv_fn)
    return out * jnp.asarray(0.2, x.dtype) + x


def build(cfg: Dict[str, Any]) -> ModelDef:
    """Build the RRDBNet ModelDef from a full config (config/defaults.py)."""
    nb = cfg["nb"]
    nr = cfg.get("nr", 3)
    upscale = int(cfg.get("upscale", 4))
    act_type = cfg.get("act_type", "leakyrelu")
    plus = bool(cfg.get("plus", False))
    up_mode = cfg.get("upsample_mode", "upconv")
    finalact = cfg.get("finalact")
    outm = cfg.get("outm")
    norm_type = cfg.get("norm_type")
    if norm_type in ("none",):
        norm_type = None
    conv_mode = cfg.get("mode", "CNA")
    if norm_type not in (None, "batch", "instance"):
        raise NotImplementedError(
            f"normalization layer [{norm_type}] is not found")
    convtype = cfg.get("convtype", "Conv2D")
    if convtype not in ("Conv2D", "Conv3D"):
        raise NotImplementedError(f"convtype {convtype} not supported")

    _n_up, factor = C.n_upscale_blocks(upscale)
    up_convs, hr0 = C.upsample_indices(upscale, up_mode)

    if convtype == "Conv3D":
        return _build_3d(cfg, nb=nb, nr=nr, act_type=act_type, plus=plus,
                         up_mode=up_mode, norm_type=norm_type,
                         upscale=upscale, factor=factor, up_convs=up_convs,
                         hr0=hr0, finalact=finalact, outm=outm)
    backend = cfg.get("backend", "auto")  # auto | pallas | xla
    # the act submodule's flat index inside each upsample block:
    # upconv [Up, conv@ci, act@ci+1]; pixelshuffle [conv@ci, PS, act@ci+2]
    act_off = 1 if up_mode == "upconv" else 2

    def apply_trunk(params, x: jax.Array) -> jax.Array:
        """fea conv -> nb RRDBs -> LR conv -> shortcut sum: the whole
        LR-resolution part of the model (96+% of FLOPs).  Split out so the
        hybrid engine can run it UNTILED on the full image (zero tile
        overlap/halo waste) and tile only the upsample tail
        (engine.hybrid_apply)."""
        fea = C.conv3x3(params, x, "model.0")
        t = fea
        rdb_names = (("RDB1", "RDB2", "RDB3") if nr == 3
                     else tuple(f"RDBs.{i}" for i in range(nr)))
        # Padded-persistent chain: when the fused Pallas RDB would fire,
        # run the WHOLE nb-RRDB trunk through fused_rrdb_trunk instead of
        # per-RDB fused_rdb calls — pad once, donate buffers between the
        # nb*nr kernel calls, RRDB residual fused in-kernel.  Removes the
        # per-call jnp.pad + output-slice HBM glue.  STATUS: OPT-IN
        # (INNFER_RDB_CHAIN=1) and NOT recommended on the axon backend —
        # the padded-IO kernel variant crashes the remote Mosaic compiler
        # (tools/out/chain_ab.json nb2_chain HTTP-500, same class as the
        # 96-row-strip crashes), and the one full-model probe that did
        # compile ran pathologically slow (18.3s b=8 forward).  Exact in
        # interpret mode (test_fused_rrdb_trunk_*); kept as the ready
        # implementation for a backend rev that fixes the Mosaic crash.
        use_chain = (
            backend in ("auto", "pallas")
            and norm_type in (None, "none")
            and os.environ.get("INNFER_RDB_CHAIN", "0") == "1"
            and f"model.1.sub.0.{rdb_names[0]}.conv1.0.bias" in params
            and (_use_pallas(t, act_type) if backend == "auto"
                 else _pallas_ok(t, act_type)))
        if use_chain:
            from innfer_tpu.ops.pallas.rdb import fused_rrdb_trunk

            key = lambda i, n, c, leaf: f"model.1.sub.{i}.{n}.conv{c}.0.{leaf}"
            tw_ = [[[params[key(i, n, c, "weight")] for c in range(1, 6)]
                    for n in rdb_names] for i in range(nb)]
            tb_ = [[[params[key(i, n, c, "bias")] for c in range(1, 6)]
                    for n in rdb_names] for i in range(nb)]
            w1_ = ([[params[f"model.1.sub.{i}.{n}.conv1x1.weight"]
                     .reshape(t.shape[-1], -1)
                     for n in rdb_names] for i in range(nb)]
                   if plus else None)
            gc_ = int(tw_[0][0][0].shape[-1])
            t = fused_rrdb_trunk(t, tw_, tb_, nb=nb, nr=nr, gc=gc_,
                                 plus=plus, conv1x1_ws=w1_)
        else:
            for i in range(nb):
                t = _rrdb(params, t, f"model.1.sub.{i}", nr=nr,
                          act_type=act_type, plus=plus, backend=backend,
                          norm_type=norm_type)
        # LR_conv: mode/norm-dependent layout, flattened into the trunk
        # sequential at positional base nb (RRDBNet_arch.py:29)
        t = C.apply_conv_block(
            params, t, lambda j: f"model.1.sub.{nb + j}", mode=conv_mode,
            norm_type=norm_type, act_type=None)
        return fea + t  # ShortcutBlock (block.py:183-194)

    def apply_tail(params, h: jax.Array) -> jax.Array:
        phase_tail = up_convs and C.phase_tail_ok(
            params, f"model.{up_convs[-1]}", factor=factor, up_mode=up_mode,
            act_type=act_type, finalact=finalact)
        for ci in (up_convs[:-1] if phase_tail else up_convs):
            h = C.apply_upsample_block(
                params, h, f"model.{ci}", mode=up_mode, factor=factor,
                act_type=act_type, act_key=f"model.{ci + act_off}")
        if phase_tail:
            # last upsample block + HR convs in phase space (nn/phase.py):
            # exact tail math without materializing HR activations
            h = C.apply_phase_tail(
                params, h, up_key=f"model.{up_convs[-1]}", up_mode=up_mode,
                act_type=act_type, hr0=hr0, finalact=finalact)
            return _outm(h, outm)
        h = F.act(act_type, C.conv3x3(params, h, f"model.{hr0}"),
                  params=params, key=f"model.{hr0 + 1}")
        h = C.conv3x3(params, h, f"model.{hr0 + 2}")
        if finalact:
            # outact is appended to the top-level sequential after HR_conv1
            # (RRDBNet_arch.py:45-48)
            h = F.act(finalact, h, params=params, key=f"model.{hr0 + 3}")
        return _outm(h, outm)

    def apply(params, x: jax.Array) -> jax.Array:
        return apply_tail(params, apply_trunk(params, x))

    # ask the tiling planner for 64-multiple tile dims whenever the fused
    # Pallas RDB could fire (see _use_pallas) so it gets >=64 blocks; the
    # kernel is per-RDB and therefore nr-agnostic (gating on nr == 3 used
    # to starve nr != 3 configs of aligned tiles, crashing backend='pallas'
    # at trace time and silently disabling 'auto')
    quantum = 64 if (backend in ("auto", "pallas")
                     and norm_type in (None, "none")
                     and act_type in ("leakyrelu", "lrelu")) else 1
    return ModelDef(
        name="rrdb_net",
        cfg=dict(cfg),
        apply=apply,
        scale=upscale,
        tile_quantum=quantum,
        tile_quantum_strict=backend == "pallas",
        apply_trunk=apply_trunk,
        apply_tail=apply_tail,
        # upsample-chain receptive radius in LR px: each upsample block's
        # 3x3 conv adds 1/prod(earlier factors); the phase tail's two HR
        # convs add <=1 more.  4 covers every scale (1/2/4/8).
        tail_halo=4,
    )


def _build_3d(cfg, *, nb, nr, act_type, plus, up_mode, norm_type, upscale,
              factor, up_convs, hr0, finalact, outm) -> ModelDef:
    """evsrgan: RRDBNet with Conv3d everywhere (video clips, NDHWC).

    Parity target: reference ``-a evsrgan`` builds RRDBNet with
    convtype='Conv3D' (defaults.py:35-38): every conv_block instantiates
    nn.Conv3d k3/pad1 (block.py:232-234) and upconv blocks nearest-upsample
    with scale (1, 2, 2) — depth untouched (block.py:357).  The reference
    CLI cannot actually feed it (its image loop is 4D-only); here the model
    is exposed at the library level (5D NDHWC input) and golden-tested
    module to module.
    """
    if plus:
        raise NotImplementedError(
            "evsrgan plus: the reference conv1x1 is nn.Conv2d "
            "(block.py:390-391) and crashes on 5D inputs")
    if norm_type not in (None, "none"):
        raise NotImplementedError(
            "evsrgan norm layers: reference norm() builds 2D norms "
            "(block.py:112-132) which crash on 5D inputs")
    if up_mode != "upconv":
        raise NotImplementedError("evsrgan supports upconv upsampling only")
    if act_type not in ("relu", "leakyrelu", "lrelu", "tanh", "sigmoid"):
        # parameterized acts (prelu weight, swish beta) need per-module
        # param plumbing that the 3D path's bare F.act calls don't have;
        # reject at build time instead of KeyError mid-trace (mirrors the
        # scatter-backend check in _rrdb)
        raise NotImplementedError(
            f"evsrgan act {act_type!r}: only parameter-free activations "
            "are supported on the Conv3D path")

    from innfer_tpu.nn import resize as R

    conv3 = lambda t, w, b=None: F.conv3d(t, w, b, padding=1)

    def apply(params, x: jax.Array) -> jax.Array:
        g = lambda k: (params[f"{k}.weight"], params.get(f"{k}.bias"))
        fea = conv3(x, *g("model.0"))
        t = fea
        for i in range(nb):
            t = _rrdb(params, t, f"model.1.sub.{i}", nr=nr, act_type=act_type,
                      plus=False, backend="xla", conv_fn=conv3)
        t = conv3(t, *g(f"model.1.sub.{nb}"))
        h = fea + t
        for ci in up_convs:
            b_, d, hh, ww, c = h.shape
            u = R.upsample_nearest(h.reshape(b_ * d, hh, ww, c), factor)
            h = u.reshape(b_, d, hh * factor, ww * factor, c)
            h = F.act(act_type, conv3(h, *g(f"model.{ci}")))
        h = F.act(act_type, conv3(h, *g(f"model.{hr0}")))
        h = conv3(h, *g(f"model.{hr0 + 2}"))
        if finalact:
            h = F.act(finalact, h)
        return _outm(h, outm)

    return ModelDef(name="rrdb_net", cfg=dict(cfg), apply=apply, scale=upscale)


def build_mrrdb(cfg: Dict[str, Any]) -> ModelDef:
    """mESRGAN: fixed-4x modified-layout RRDB.  Checkpoints are remapped to
    the flattened layout (remaps.mod_to_normal) and run through the rrdb
    forward — the MRRDBNet forward (RRDBNet_arch.py:189-198) is exactly the
    flattened 4x upconv path."""
    full = {
        "type": "rrdb_net",
        "nb": cfg["nb"],
        "nr": 3,
        "nf": cfg.get("nf", 64),
        "gc": cfg.get("gc", 32),
        "in_nc": cfg.get("in_nc", 3),
        "out_nc": cfg.get("out_nc", 3),
        "upscale": 4,
        "act_type": "leakyrelu",
        "upsample_mode": "upconv",
        "norm_type": None,
        "plus": False,
    }
    model = build(full)
    model.name = "mrrdb_net"
    model.remap = mod_to_normal
    return model
