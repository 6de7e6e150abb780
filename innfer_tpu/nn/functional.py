"""Core functional NN ops with exact PyTorch inference semantics, NHWC layout.

This is the numerical foundation of the framework: every architecture in
``innfer_tpu.models`` is a pure function composed from the ops here.  All ops

  * take activations as NHWC (TPU-native) ``jnp.ndarray``,
  * take weights in TPU-native layouts (conv: HWIO; transposed conv: HWIO of
    the equivalent fractionally-strided conv, pre-flipped at checkpoint
    conversion time, see ``innfer_tpu.checkpoint.convert``),
  * are shape-static and jit/vmap/shard_map friendly (no data-dependent
    Python control flow),
  * accumulate matmuls/convs in float32 via ``preferred_element_type`` so
    bfloat16 activations keep fp32 accumulation on the MXU.

Numerical parity targets (verified in tests/test_functional.py against
torch CPU): Conv2d, ConvTranspose2d, LeakyReLU/PReLU/ReLU/Tanh/Sigmoid,
PixelShuffle, MaxPool2d, reflection/replication padding, InstanceNorm2d
(affine=False, no running stats), BatchNorm2d (train and eval modes).

Reference behaviors reimplemented (cited for parity auditing, not copied):
  /root/reference/architectures/block.py:81-101 (activations)
  /root/reference/architectures/block.py:112-132 (norm layers)
  /root/reference/architectures/block.py:144-160 (padding layers)
  /root/reference/architectures/block.py:333-346 (pixelshuffle block)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

_DIMNUMS_NHWC = ("NHWC", "HWIO", "NHWC")


def _mm_precision(dtype) -> Optional[lax.Precision]:
    """Matmul/conv ``precision`` for activations of ``dtype``.

    On TPU, ``Precision.DEFAULT`` multiplies fp32 operands as single-pass
    bfloat16 on the MXU — ``preferred_element_type=f32`` only keeps the
    *accumulator* wide, not the products.  That truncation is invisible to
    the CPU test suite but measurably drifts the fp32 parity path on-chip:
    the round-5 on-chip golden gate caught UNet128 at 55.8 dB and
    CycleGAN9 at 45.9 dB vs the PyTorch fp32 fixtures (norm layers amplify
    operand rounding via rsqrt(var)), while DEFAULT-precision SR families
    still cleared 76+ dB.  fp32 inputs therefore request HIGHEST (multi-
    pass bf16, ~fp32-accurate): fp32 is the parity/audit path where
    exactness is the point; the bf16 product path is untouched (its
    operands are already bf16, precision is moot).
    """
    return lax.Precision.HIGHEST if dtype in (jnp.float32, jnp.float64) \
        else None


def conv2d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int], Sequence[Tuple[int, int]]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
    accum_dtype=jnp.float32,
    out_dtype=None,
) -> Array:
    """2D convolution, NHWC x HWIO -> NHWC.  Matches torch.nn.Conv2d.

    ``padding`` may be an int (symmetric), an (ph, pw) tuple, or an explicit
    [(top, bottom), (left, right)] list for asymmetric (TF-"SAME"-style) pads.
    Weights are cast to the activation dtype (bf16 activations can run over
    fp32-stored params); accumulation happens in ``accum_dtype`` (fp32 by
    default) and the result is cast back to the input dtype (or ``out_dtype``
    when given — e.g. fp32 so a caller can keep accumulating across convs).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_DIMNUMS_NHWC,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
        precision=_mm_precision(x.dtype),
    )
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(out_dtype or x.dtype)


def conv3d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    stride: Union[int, Tuple[int, int, int]] = 1,
    padding: Union[int, Tuple[int, int, int]] = 0,
    dilation: Union[int, Tuple[int, int, int]] = 1,
    accum_dtype=jnp.float32,
) -> Array:
    """3D convolution, NDHWC x DHWIO -> NDHWC.  Matches torch.nn.Conv3d
    (the reference's evsrgan convtype='Conv3D', block.py:232-234)."""
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(dilation, int):
        dilation = (dilation,) * 3
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype,
        precision=_mm_precision(x.dtype),
    )
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


def conv_transpose2d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 2,
    padding: Union[int, Tuple[int, int]] = 1,
    output_padding: Union[int, Tuple[int, int]] = 0,
    accum_dtype=jnp.float32,
) -> Array:
    """2D transposed convolution matching torch.nn.ConvTranspose2d.

    ``w`` must be the *pre-converted* HWIO kernel: the torch ConvTranspose2d
    weight has layout (I, O, kh, kw); the checkpoint converter spatially flips
    it and transposes to (kh, kw, I, O) so that the transposed conv becomes a
    plain input-dilated convolution here (the XLA-native formulation).

    out_size = (in - 1) * stride - 2 * padding + kernel + output_padding
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    # Lowering decision (round 4, tools/out/subpixel_e2e_ab.json): the
    # input-dilated form is the ONLY path.  An exact subpixel rewrite
    # (k2x2 phase conv + pixel shuffle, 4x fewer MACs) was built in
    # round 3 and measured +24% — but that A/B carried a 0.47 s/call
    # sync artifact; the clean same-window e2e re-measurement shows
    # dilated FASTER at every UNet batch size (1.5-2.2%) and for
    # CycleGAN (5%): the UNet-256 forward sits entirely under this
    # backend's per-call floor (b1==b4==b8 ~27 ms), so the rewrite's
    # extra slice/stack/shuffle ops cost more than the MACs they save.
    kh, kw = w.shape[0], w.shape[1]
    pads = [
        (kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
        (kw - 1 - padding[1], kw - 1 - padding[1] + output_padding[1]),
    ]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_DIMNUMS_NHWC,
        preferred_element_type=accum_dtype,
        precision=_mm_precision(x.dtype),
    )
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


def dense(x: Array, w: Array, b: Optional[Array] = None, *, accum_dtype=jnp.float32) -> Array:
    """Channel-mixing matmul over the last axis (used for 1x1 Conv1d layers).

    ``w`` has layout (I, O)."""
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=accum_dtype,
                  precision=_mm_precision(x.dtype))
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------

def pad2d(x: Array, pad: Union[int, Tuple[int, int, int, int]], mode: str = "zero") -> Array:
    """Spatial padding of an NHWC tensor.

    ``pad`` is an int (all sides) or torch-F.pad-ordered (left, right, top,
    bottom).  ``mode``: 'zero' | 'reflect' | 'replicate'.
    Matches nn.ReflectionPad2d / nn.ReplicationPad2d / nn.ZeroPad2d
    (reference block.py:144-160).
    """
    if isinstance(pad, int):
        l = r = t = bm = pad
    else:
        l, r, t, bm = pad
    widths = [(0, 0), (t, bm), (l, r), (0, 0)]
    if mode == "zero":
        return jnp.pad(x, widths)
    if mode == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, widths, mode="edge")
    raise NotImplementedError(f"padding mode [{mode}] is not implemented")


def tf_same_padding(x: Array, k_size: int = 3) -> Array:
    """TF-style asymmetric SAME padding for stride-2 convs.

    Reproduces the WBC tf-mode padding (reference WBCNet_arch.py:141-143):
    pad (left, right, top, bottom) = (j-1, j, j-1, j) with j = k//2.
    """
    j = k_size // 2
    return pad2d(x, (j - 1, j, j - 1, j), mode="zero")


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def relu(x: Array) -> Array:
    return jax.nn.relu(x)


def leaky_relu(x: Array, neg_slope: float = 0.2) -> Array:
    return jnp.where(x >= 0, x, x * jnp.asarray(neg_slope, x.dtype))


def prelu(x: Array, weight: Array) -> Array:
    """PReLU with per-channel (or single) weight; channel is the last axis."""
    w = weight.astype(x.dtype)
    if w.size > 1:
        w = w.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * w)


def swish(x: Array, beta: Array, slope: float = 1.67653251702,
          inplace: bool = False) -> Array:
    """Learnable-beta Swish: 2*(slope/2)*x*sigmoid(beta*x).

    Reference block.py:14-78 (Swish module: stored slope is user_slope/2 and
    forward multiplies by 2*self.slope, i.e. net factor = user slope).

    ``inplace=True`` reproduces the reference's in-place swish_func bug
    (block.py:36-40): ``torch.sigmoid_(beta*x)`` operates on a temporary
    whose result is discarded, then ``x *= x.clone()``, so the module
    actually computes ``slope * x**2``.  conv_block activations default to
    inplace (block.py:81), so checkpoints trained with swish embody this;
    verified empirically against the reference (tests/goldens
    esrgan_swish_x2).
    """
    s = jnp.asarray(slope, x.dtype)
    if inplace:
        return s * x * x
    return s * x * jax.nn.sigmoid(beta.astype(x.dtype) * x)


def tanh(x: Array) -> Array:
    return jnp.tanh(x)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def act(kind: Optional[str], x: Array, *, neg_slope: float = 0.2, params=None,
        key: str = "", inplace: bool = True) -> Array:
    """Activation dispatcher mirroring reference block.py:81-101.

    ``inplace`` mirrors the reference act() default (True); it only changes
    the math for swish (see ``swish``).  The sole out-of-place call site in
    the reference is NAC-mode conv_blocks without norm (block.py:247-252).
    """
    if kind is None:
        return x
    kind = kind.lower()
    if kind == "relu":
        return relu(x)
    if kind in ("leakyrelu", "lrelu"):
        return leaky_relu(x, neg_slope)
    if kind == "prelu":
        if params is None or not key:
            raise NotImplementedError(
                "prelu activation needs parameter plumbing at this call site"
            )
        return prelu(x, params[key + ".weight"])
    if kind == "tanh":
        return tanh(x)
    if kind == "sigmoid":
        return sigmoid(x)
    if kind == "swish":
        if params is None or not key:
            raise NotImplementedError(
                "swish activation needs parameter plumbing at this call site"
            )
        return swish(x, params[key + ".beta"], inplace=inplace)
    raise NotImplementedError(f"activation layer [{kind}] is not found")


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def instance_norm(x: Array, *, eps: float = 1e-5, weight: Optional[Array] = None,
                  bias: Optional[Array] = None) -> Array:
    """InstanceNorm2d with per-sample spatial statistics (biased variance).

    Matches torch.nn.InstanceNorm2d(affine=False, track_running_stats=False)
    in both train and eval mode (reference block.py:124).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    out = (x32 - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def batch_norm(
    x: Array,
    weight: Array,
    bias: Array,
    running_mean: Optional[Array],
    running_var: Optional[Array],
    *,
    training: bool = False,
    eps: float = 1e-5,
) -> Array:
    """BatchNorm2d.  ``training=True`` uses PER-IMAGE batch statistics over
    (H,W) with biased variance — the pix2pix ``meval=False`` path
    (reference run.py:299-303).  The reference always forwards a batch of
    one, where (N,H,W) and per-image statistics coincide; reducing per
    image keeps every batched forward (``--batch N``) bitwise-equivalent
    to N reference-semantics forwards instead of silently pooling
    statistics across unrelated images.  ``training=False`` uses the
    stored running stats.
    """
    x32 = x.astype(jnp.float32)
    if training or running_mean is None:
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    else:
        mean = running_mean.astype(jnp.float32)
        var = running_var.astype(jnp.float32)
    scale = weight.astype(jnp.float32) * lax.rsqrt(var + eps)
    shift = bias.astype(jnp.float32) - mean * scale
    return (x32 * scale + shift).astype(x.dtype)


# ---------------------------------------------------------------------------
# Shuffles / pooling
# ---------------------------------------------------------------------------

def pixel_shuffle(x: Array, r: int) -> Array:
    """PixelShuffle matching torch channel ordering, in NHWC.

    torch (NCHW): out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w].
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def max_pool2d(x: Array, kernel: int, stride: Optional[int] = None) -> Array:
    """MaxPool2d with no padding (matches nn.MaxPool2d(k, s))."""
    if stride is None:
        stride = kernel
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------

def softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)
