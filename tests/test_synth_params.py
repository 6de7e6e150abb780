"""Synthetic state dicts must build and run through the normal converter
for every family (backs the benchmark harness and the dry-run entry)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import synth_params as SP


CASES = [
    ("esrgan", dict(nb=2, nf=16), 2, (16, 16), (32, 32)),
    ("srresnet", dict(nb=2, nf=16), 2, (16, 16), (32, 32)),
    ("ppon", dict(nb=1), 2, (16, 16), (32, 32)),
    ("pan", dict(nb=2, nf=8, unf=6), 2, (16, 16), (32, 32)),
    ("cyclegan", dict(n_blocks=2, ngf=8), 1, (32, 32), (32, 32)),
    ("wbc", dict(nf=8), 1, (32, 32), (32, 32)),
]


@pytest.mark.parametrize("family,kw,scale,in_hw,out_hw", CASES)
def test_family_builds_and_runs(family, kw, scale, in_hw, out_hw):
    model, params = SP.build(family, scale=scale, **kw)
    x = jnp.asarray(np.random.default_rng(0).random((1, *in_hw, 3), np.float32))
    out = jax.jit(model.apply)(params, x)
    if model.output_index is not None:
        out = out[model.output_index]
    assert out.shape == (1, *out_hw, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_synth():
    model, params = SP.build("unet", num_downs=5, ngf=8)
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3), np.float32))
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (1, 32, 32, 3)
