"""Fused CycleGAN ResnetBlock kernel vs the XLA reference math.

Interpret mode on CPU; on-chip numbers live in tools/on_chip_parity.py
artifacts.  Reference semantics: models/resnet.py res_block (reflect pad,
conv3x3+bias, instance norm without affine, relu, second conv+IN,
residual add) — reference ResNet_arch.py build_conv_block.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from innfer_tpu.ops.pallas.resnet_block import fused_resnet_block, slab_ok


def xla_block(x, w1, b1, w2, b2, eps=1e-5):
    def conv_in(t, w, b, relu):
        t = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        o = jax.lax.conv_general_dilated(
            t, w.astype(t.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + b
        m = jnp.mean(o, axis=(1, 2), keepdims=True)
        d = o - m
        v = jnp.mean(d * d, axis=(1, 2), keepdims=True)
        o = d * jax.lax.rsqrt(v + eps)
        if relu:
            o = jnp.maximum(o, 0.0)
        return o.astype(x.dtype)

    h = conv_in(x, w1, b1, relu=True)
    h = conv_in(h, w2, b2, relu=False)
    return (x.astype(jnp.float32) + h.astype(jnp.float32)).astype(x.dtype)


@pytest.fixture(scope="module")
def params():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w1 = jax.random.normal(k1, (3, 3, 256, 256), jnp.float32) * 0.02
    w2 = jax.random.normal(k2, (3, 3, 256, 256), jnp.float32) * 0.02
    b1 = jax.random.normal(k3, (256,), jnp.float32) * 0.1
    b2 = jax.random.normal(k4, (256,), jnp.float32) * 0.1
    return w1, b1, w2, b2


@pytest.mark.parametrize("shape", [(2, 8, 16, 256), (1, 12, 32, 256),
                                   (3, 16, 16, 256)])
def test_matches_xla_fp32(params, shape):
    w1, b1, w2, b2 = params
    x = jax.random.normal(jax.random.PRNGKey(5), shape, jnp.float32)
    ref = np.asarray(xla_block(x, w1, b1, w2, b2), np.float32)
    got = np.asarray(
        fused_resnet_block(x, w1, b1, w2, b2, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_matches_xla_bf16(params):
    w1, b1, w2, b2 = params
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 16, 256),
                          jnp.bfloat16)
    ref = np.asarray(xla_block(x, w1.astype(jnp.bfloat16), b1,
                               w2.astype(jnp.bfloat16), b2), np.float32)
    got = np.asarray(fused_resnet_block(
        x, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
        interpret=True), np.float32)
    # bf16 rounding-order differences only
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(max(1.0, np.abs(ref).max()) ** 2 / max(mse, 1e-20))
    assert psnr > 55, psnr


def test_no_bias(params):
    w1, _, w2, _ = params
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 16, 256), jnp.float32)
    zero = jnp.zeros((256,), jnp.float32)
    ref = np.asarray(xla_block(x, w1, zero, w2, zero), np.float32)
    got = np.asarray(fused_resnet_block(x, w1, None, w2, None,
                                        interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_gates():
    assert not slab_ok((1, 8, 16, 128), jnp.bfloat16)   # channels
    assert not slab_ok((1, 8, 20, 256), jnp.bfloat16)   # width not 16-mult
    assert not slab_ok((1, 128, 128, 256), jnp.bfloat16)  # VMEM cap
    with pytest.raises(ValueError, match="256 channels"):
        fused_resnet_block(
            jnp.zeros((1, 8, 16, 128), jnp.float32),
            jnp.zeros((3, 3, 128, 128)), None,
            jnp.zeros((3, 3, 128, 128)), None, interpret=True)
    with pytest.raises(ValueError, match="16-multiple"):
        fused_resnet_block(
            jnp.zeros((1, 8, 20, 256), jnp.float32),
            jnp.zeros((3, 3, 256, 256)), None,
            jnp.zeros((3, 3, 256, 256)), None, interpret=True)
