"""Resize parity tests vs torch.nn.functional.interpolate (CPU fp32)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from innfer_tpu.nn import resize as R


def to_nhwc(t):
    return np.ascontiguousarray(np.transpose(t, (0, 2, 3, 1)))


def from_nhwc(t):
    return np.ascontiguousarray(np.transpose(np.asarray(t), (0, 3, 1, 2)))


CASES = [
    # (mode, align_corners, in_hw, out_hw)
    ("nearest", None, (10, 13), (20, 26)),
    ("nearest", None, (10, 13), (30, 39)),
    ("nearest", None, (10, 13), (7, 9)),        # downscale
    ("nearest", None, (10, 13), (23, 17)),      # non-integer
    ("bilinear", True, (10, 13), (20, 26)),     # PAN ILR
    ("bilinear", True, (10, 13), (40, 52)),
    ("bilinear", False, (10, 13), (20, 26)),    # WBC pt-mode
    ("bilinear", False, (16, 16), (7, 9)),
    ("bilinear", True, (8, 8), (31, 13)),
    ("bicubic", False, (5, 7), (20, 28)),       # FSA restore
    ("bicubic", False, (16, 16), (9, 11)),
    ("bicubic", True, (5, 7), (20, 28)),
]


@pytest.mark.parametrize("mode,ac,in_hw,out_hw", CASES)
def test_interpolate(rng, mode, ac, in_hw, out_hw):
    x = rng.standard_normal((2, in_hw[0], in_hw[1], 3), dtype=np.float32)
    xt = torch.from_numpy(from_nhwc(x))
    kwargs = {} if ac is None else {"align_corners": ac}
    ref = TF.interpolate(xt, size=out_hw, mode=mode, **kwargs)
    out = R.interpolate(jnp.asarray(x), size=out_hw, mode=mode, align_corners=ac)
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=3e-5, rtol=3e-5)


def test_scale_factor_matches_torch(rng):
    x = rng.standard_normal((1, 9, 11, 3), dtype=np.float32)
    xt = torch.from_numpy(from_nhwc(x))
    ref = TF.interpolate(xt, scale_factor=2.0, mode="nearest")
    out = R.interpolate(jnp.asarray(x), scale_factor=2.0, mode="nearest")
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=0, rtol=0)


def test_tf_2x_bilinear(rng):
    """Parity with the reference TF-style 2x bilinear upsample
    (WBCNet_arch.py:127-138), reimplemented here in torch as the oracle."""
    x = rng.standard_normal((2, 6, 7, 4), dtype=np.float32)
    xt = torch.from_numpy(from_nhwc(x))
    b, c, h, w = xt.shape
    ref = torch.zeros(b, c, h * 2, w * 2)
    ref[:, :, ::2, ::2] = xt
    padded = TF.pad(xt, (0, 1, 0, 1), mode="replicate")
    ref[:, :, 1::2, ::2] = (padded[:, :, :-1, :-1] + padded[:, :, 1:, :-1]) / 2
    ref[:, :, ::2, 1::2] = (padded[:, :, :-1, :-1] + padded[:, :, :-1, 1:]) / 2
    ref[:, :, 1::2, 1::2] = (padded[:, :, :-1, :-1] + padded[:, :, 1:, 1:]) / 2
    out = R.tf_2x_bilinear(jnp.asarray(x))
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=1e-6, rtol=1e-6)


def test_upsample_nearest_exact(rng):
    x = rng.standard_normal((1, 5, 6, 3), dtype=np.float32)
    ref = TF.interpolate(torch.from_numpy(from_nhwc(x)), scale_factor=2, mode="nearest")
    out = R.upsample_nearest(jnp.asarray(x), 2)
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=0, rtol=0)
