"""Scatter-wide RDB formulation (models/rrdb._rdb5c_scatter) vs gather.

The scatter form regroups the dense-block convs by SOURCE (one conv per
source producing all its later-target contributions); in exact arithmetic it
is the same function as the reference gather form (RRDBNet_arch.py:152-165),
and in fp32 it differs only by summation order (~1e-6 rel)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from innfer_tpu.models.rrdb import _rdb5c, _rdb5c_scatter


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _params(rng, nf, gc, plus=False, bias=True):
    p = {}
    for c in range(1, 6):
        cin = nf + (c - 1) * gc
        cout = gc if c < 5 else nf
        p[f"B.conv{c}.0.weight"] = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
            / np.sqrt(9 * cin))
        if bias:
            p[f"B.conv{c}.0.bias"] = jnp.asarray(
                rng.standard_normal(cout).astype(np.float32) * 0.02)
    if plus:
        p["B.conv1x1.weight"] = jnp.asarray(
            rng.standard_normal((1, 1, nf, gc)).astype(np.float32) / np.sqrt(nf))
    return p


@pytest.mark.parametrize("nf,gc", [(64, 32), (32, 16)])
@pytest.mark.parametrize("plus", [False, True])
def test_scatter_matches_gather_fp32(rng, nf, gc, plus):
    p = _params(rng, nf, gc, plus=plus)
    x = jnp.asarray(rng.standard_normal((2, 17, 23, nf)).astype(np.float32))
    g = _rdb5c(p, x, "B", act_type="leakyrelu", plus=plus)
    s = _rdb5c_scatter(p, x, "B", act_type="leakyrelu", plus=plus)
    np.testing.assert_allclose(np.asarray(s), np.asarray(g),
                               rtol=2e-5, atol=2e-6)


def test_scatter_no_bias(rng):
    p = _params(rng, 64, 32, bias=False)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64)).astype(np.float32))
    g = _rdb5c(p, x, "B", act_type="leakyrelu", plus=False)
    s = _rdb5c_scatter(p, x, "B", act_type="leakyrelu", plus=False)
    np.testing.assert_allclose(np.asarray(s), np.asarray(g),
                               rtol=2e-5, atol=2e-6)


def test_scatter_bf16_close(rng):
    p = _params(rng, 64, 32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 64)).astype(np.float32))
    g = _rdb5c(p, x.astype(jnp.bfloat16), "B", act_type="leakyrelu", plus=False)
    s = _rdb5c_scatter(p, x.astype(jnp.bfloat16), "B", act_type="leakyrelu",
                       plus=False)
    ref = np.asarray(_rdb5c(p, x, "B", act_type="leakyrelu", plus=False))
    err_s = np.abs(np.asarray(s, np.float32) - ref).max()
    err_g = np.abs(np.asarray(g, np.float32) - ref).max()
    # scatter's bf16 error must be in the same class as gather's
    assert err_s <= 4 * err_g + 1e-3


def test_backend_scatter_rejects_norm():
    from innfer_tpu.models.rrdb import _rrdb
    with pytest.raises(ValueError, match="scatter"):
        _rrdb({}, jnp.zeros((1, 8, 8, 64)), "B", nr=3, act_type="prelu",
              plus=False, backend="scatter")
