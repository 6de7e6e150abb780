"""Op-level parity tests: innfer_tpu.nn.functional vs torch CPU fp32.

These lock the numerical foundation: every architecture is a composition of
the ops tested here, so op-level exactness (<= ~1e-5 rel) is what makes the
>=60 dB model-level PSNR target achievable.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from innfer_tpu.nn import functional as F


def to_nhwc(t):
    return np.ascontiguousarray(np.transpose(t, (0, 2, 3, 1)))


def from_nhwc(t):
    return np.ascontiguousarray(np.transpose(t, (0, 3, 1, 2)))


def conv_w_to_hwio(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def assert_close(ours_nhwc, theirs_nchw, atol=2e-5, rtol=2e-5):
    np.testing.assert_allclose(
        from_nhwc(np.asarray(ours_nhwc)), theirs_nchw.numpy(), atol=atol, rtol=rtol
    )


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 1, 1, 1), (2, 1, 1, 1), (1, 0, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4),
])
def test_conv2d(rng, stride, padding, dilation, groups):
    x = rng.standard_normal((2, 8, 11, 13), dtype=np.float32)
    w = rng.standard_normal((16, 8 // groups, 3, 3), dtype=np.float32)
    b = rng.standard_normal(16, dtype=np.float32)
    ref = TF.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=padding, dilation=dilation, groups=groups)
    out = F.conv2d(jnp.asarray(to_nhwc(x)), jnp.asarray(conv_w_to_hwio(w)),
                   jnp.asarray(b), stride=stride, padding=padding * dilation if False else padding,
                   dilation=dilation, groups=groups)
    assert_close(out, ref)


@pytest.mark.parametrize("k,stride,padding,output_padding", [
    (4, 2, 1, 0),  # pix2pix UNet deconv
    (3, 2, 1, 1),  # CycleGAN ResNet deconv
])
def test_conv_transpose2d(rng, k, stride, padding, output_padding):
    x = rng.standard_normal((2, 7, 9, 8), dtype=np.float32)
    w = rng.standard_normal((8, 16, k, k), dtype=np.float32)  # torch (I, O, kh, kw)
    b = rng.standard_normal(16, dtype=np.float32)
    ref = TF.conv_transpose2d(torch.from_numpy(from_nhwc(x)), torch.from_numpy(w),
                              torch.from_numpy(b), stride=stride, padding=padding,
                              output_padding=output_padding)
    # converter layout: flip spatial, then (kh, kw, I, O)
    w_conv = np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))
    out = F.conv_transpose2d(jnp.asarray(x), jnp.asarray(w_conv), jnp.asarray(b),
                             stride=stride, padding=padding, output_padding=output_padding)
    assert_close(out, ref)


def test_conv_transpose2d_lowering_is_input_dilated(rng):
    """Pin the ONE deconv lowering (round-4 decision, VERDICT r3 #4).

    The subpixel rewrite was removed after the clean same-window e2e A/B
    (tools/out/subpixel_e2e_ab.json) showed input-dilated faster at every
    UNet batch size and for CycleGAN; this guards against the lowering
    silently changing (the jaxpr must be a single lhs-dilated conv)."""
    import jax

    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    w = jnp.zeros((4, 4, 8, 16), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda t: F.conv_transpose2d(t, w, None, stride=2, padding=1))(x)
    convs = [e for e in jaxpr.jaxpr.eqns
             if e.primitive.name == "conv_general_dilated"]
    assert len(convs) == 1
    assert convs[0].params["lhs_dilation"] == (2, 2)


def test_pixel_shuffle(rng):
    x = rng.standard_normal((2, 5, 6, 36), dtype=np.float32)
    ref = TF.pixel_shuffle(torch.from_numpy(from_nhwc(x)), 3)
    out = F.pixel_shuffle(jnp.asarray(x), 3)
    assert_close(out, ref)


def test_max_pool(rng):
    x = rng.standard_normal((2, 16, 20, 8), dtype=np.float32)
    ref = TF.max_pool2d(torch.from_numpy(from_nhwc(x)), 4, 4)
    out = F.max_pool2d(jnp.asarray(x), 4)
    assert_close(out, ref)


@pytest.mark.parametrize("mode,tmode", [("reflect", "reflect"), ("replicate", "replicate"), ("zero", "constant")])
def test_pad(rng, mode, tmode):
    x = rng.standard_normal((1, 8, 9, 3), dtype=np.float32)
    ref = TF.pad(torch.from_numpy(from_nhwc(x)), (1, 2, 3, 1), mode=tmode)
    out = F.pad2d(jnp.asarray(x), (1, 2, 3, 1), mode=mode)
    assert_close(out, ref)


def test_tf_same_padding(rng):
    x = rng.standard_normal((1, 8, 9, 3), dtype=np.float32)
    ref = TF.pad(torch.from_numpy(from_nhwc(x)), (0, 1, 0, 1))
    out = F.tf_same_padding(jnp.asarray(x), 3)
    assert_close(out, ref)


def test_leaky_relu_prelu(rng):
    x = rng.standard_normal((2, 4, 5, 6), dtype=np.float32)
    ref = TF.leaky_relu(torch.from_numpy(from_nhwc(x)), 0.2)
    out = F.leaky_relu(jnp.asarray(x), 0.2)
    assert_close(out, ref)
    pw = rng.standard_normal(6, dtype=np.float32)
    ref = TF.prelu(torch.from_numpy(from_nhwc(x)), torch.from_numpy(pw))
    out = F.prelu(jnp.asarray(x), jnp.asarray(pw))
    assert_close(out, ref)


def test_instance_norm(rng):
    x = rng.standard_normal((2, 8, 9, 6), dtype=np.float32)
    ref = TF.instance_norm(torch.from_numpy(from_nhwc(x)))
    out = F.instance_norm(jnp.asarray(x))
    assert_close(out, ref, atol=1e-4, rtol=1e-4)


def test_batch_norm_train_and_eval(rng):
    x = rng.standard_normal((4, 8, 9, 6), dtype=np.float32)
    wt = rng.standard_normal(6, dtype=np.float32)
    bs = rng.standard_normal(6, dtype=np.float32)
    rm = rng.standard_normal(6, dtype=np.float32)
    rv = rng.standard_normal(6, dtype=np.float32) ** 2 + 0.5
    xt = torch.from_numpy(from_nhwc(x))
    # eval mode
    ref = TF.batch_norm(xt, torch.from_numpy(rm), torch.from_numpy(rv),
                        torch.from_numpy(wt), torch.from_numpy(bs), training=False)
    out = F.batch_norm(jnp.asarray(x), jnp.asarray(wt), jnp.asarray(bs),
                       jnp.asarray(rm), jnp.asarray(rv), training=False)
    assert_close(out, ref, atol=1e-4, rtol=1e-4)
    # train mode (pix2pix meval=False path): PER-IMAGE statistics.  The
    # reference only ever forwards batch 1 (run.py:404-442), where torch's
    # (N,H,W) reduction IS per-image; we keep that per-image reduction at
    # any N so batched directory mode stays reference-equivalent instead
    # of pooling statistics across unrelated images.
    out = F.batch_norm(jnp.asarray(x), jnp.asarray(wt), jnp.asarray(bs),
                       jnp.asarray(rm), jnp.asarray(rv), training=True)
    for i in range(x.shape[0]):
        ref_i = TF.batch_norm(
            xt[i:i + 1], torch.from_numpy(rm.copy()), torch.from_numpy(rv.copy()),
            torch.from_numpy(wt), torch.from_numpy(bs), training=True)
        assert_close(out[i:i + 1], ref_i, atol=1e-4, rtol=1e-4)


def test_dense_as_conv1d(rng):
    x = rng.standard_normal((2, 40, 13), dtype=np.float32)  # B, C, N (torch conv1d input)
    w = rng.standard_normal((5, 40, 1), dtype=np.float32)
    b = rng.standard_normal(5, dtype=np.float32)
    ref = TF.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    # ours: (B, N, C) x (C, O)
    out = F.dense(jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(w[:, :, 0].T), jnp.asarray(b))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1)), ref.numpy(), atol=2e-5, rtol=2e-5)


def test_mm_precision_policy():
    """fp32 operands must request HIGHEST so the MXU doesn't silently
    truncate them to single-pass bf16 (ONCHIP r5: UNet128 55.8 dB ->
    105.4 dB, CycleGAN9 45.9 -> 103.8 on-chip).  bf16/f16 inherit the
    backend default (operands are already low-precision; a non-None
    precision would only forbid XLA from fusing)."""
    import jax
    assert F._mm_precision(jnp.float32) == jax.lax.Precision.HIGHEST
    assert F._mm_precision(jnp.float64) == jax.lax.Precision.HIGHEST
    assert F._mm_precision(jnp.bfloat16) is None
    assert F._mm_precision(jnp.float16) is None
