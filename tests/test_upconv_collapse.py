"""LR-collapsed upconv (common.collapse_upconv_weight) vs the direct
nearest-upsample + HR conv form: exact up to kernel-tap pre-summation."""
import numpy as np
import pytest

import jax.numpy as jnp

from innfer_tpu.models.common import collapse_upconv_weight
from innfer_tpu.nn import functional as F
from innfer_tpu.nn import resize as R


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def direct(x, w, b, r):
    u = R.upsample_nearest(x, r)
    return F.conv2d(u, w, b, padding=1)


def collapsed(x, w, b, r):
    w2, b2 = collapse_upconv_weight(w, b, r)
    return F.pixel_shuffle(F.conv2d(x, w2, b2, padding=1), r)


@pytest.mark.parametrize("r", [2, 3, 4])
@pytest.mark.parametrize("hw", [(7, 9), (16, 16)])
def test_collapse_exact_fp32(rng, r, hw):
    h, w_ = hw
    cin, cout = 8, 5
    x = jnp.asarray(rng.standard_normal((2, h, w_, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(collapsed(x, w, b, r)), np.asarray(direct(x, w, b, r)),
        rtol=1e-5, atol=1e-5)


def test_collapse_no_bias(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(collapsed(x, w, None, 2)), np.asarray(direct(x, w, None, 2)),
        rtol=1e-5, atol=1e-5)
