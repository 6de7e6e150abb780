"""Phase-space (deferred pixel-shuffle) tail: exactness vs the
materialized path (nn/phase.py, models/common.py apply_phase_tail).

The phase decomposition is a pure rearrangement of conv taps, so the
only allowed difference is fp32 accumulation order (~1e-6 rel).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from innfer_tpu.nn import functional as F
from innfer_tpu.nn import phase as PH
from tools import synth_params as SP


def hr_to_phase(hr, r):
    b, h, w, c = hr.shape
    t = hr.reshape(b, h // r, r, w // r, r, c)
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(
        max(1.0, np.abs(b).max()) ** 2 / mse)


class TestPhaseConv:
    @pytest.mark.parametrize("r", [2, 3])
    def test_matches_hr_conv(self, rng, r):
        hr = jnp.asarray(rng.standard_normal((2, 6 * r, 4 * r, 5)),
                         jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((7,)), jnp.float32)
        ref = F.conv2d(hr, w, b, padding=1)
        out = PH.phase_shuffle_out(
            PH.phase_conv3x3(hr_to_phase(hr, r), w, b, r), r)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    def test_dense_matches_hr_conv(self, rng):
        hr = jnp.asarray(rng.standard_normal((1, 8, 12, 4)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((6,)), jnp.float32)
        ref = F.conv2d(hr, w, b, padding=1)
        out = PH.phase_shuffle_out(
            PH.phase_conv3x3_dense(hr_to_phase(hr, 2), w, b, 2), 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    def test_shuffle_roundtrip(self, rng):
        hr = jnp.asarray(rng.standard_normal((2, 8, 6, 3)), jnp.float32)
        assert np.array_equal(
            np.asarray(PH.phase_shuffle_out(hr_to_phase(hr, 2), 2)),
            np.asarray(hr))

    def test_cmajor_permutations(self, rng):
        """pixelshuffle-mode conv + torch PixelShuffle == phase-major conv
        + phase_shuffle_out."""
        x = jnp.asarray(rng.standard_normal((1, 6, 5, 4)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 12)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((12,)), jnp.float32)
        ref = F.pixel_shuffle(F.conv2d(x, w, b, padding=1), 2)
        out = PH.phase_shuffle_out(
            F.conv2d(x, PH.cmajor_to_phase_major(w, 2),
                     PH.cmajor_bias_to_phase_major(b, 2), padding=1), 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)


def _force_materialized(monkeypatch):
    """Route the tail through the materialized path (the phase predicate is
    the only gate; the env hook was deleted after tools/out/phase_tail_ab.json
    showed phase exact + faster)."""
    from innfer_tpu.models import common as C

    monkeypatch.setattr(C, "phase_tail_ok", lambda *a, **k: False)


class TestModelPhaseTail:
    def _ab(self, monkeypatch, family, **kw):
        model, params = SP.build(family, **kw)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((1, 24, 20, 3), np.float32))
        with monkeypatch.context() as m:
            _force_materialized(m)
            ref = jax.jit(model.apply)(params, x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == ref.shape
        return np.asarray(out), np.asarray(ref)

    @pytest.mark.parametrize("scale", [2, 4, 8])
    def test_esrgan_upconv(self, monkeypatch, scale):
        out, ref = self._ab(monkeypatch, "esrgan", scale=scale, nb=1, nf=16)
        assert psnr(out, ref) >= 110

    def test_srresnet_pixelshuffle(self, monkeypatch):
        out, ref = self._ab(monkeypatch, "srresnet", scale=4, nb=2, nf=16)
        assert psnr(out, ref) >= 110

    def test_scale3_falls_back_exactly(self, monkeypatch):
        # scale 3 (factor != 2) must not take the phase path: bit-equal
        out, ref = self._ab(monkeypatch, "esrgan", scale=3, nb=1, nf=16)
        assert np.array_equal(out, ref)

    def test_bf16(self, monkeypatch):
        model, params = SP.build("esrgan", scale=4, nb=1, nf=16,
                                 dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(5).random((1, 24, 16, 3),
                                                        np.float32),
                        jnp.bfloat16)
        with monkeypatch.context() as m:
            _force_materialized(m)
            ref = jax.jit(model.apply)(params, x)
        out = jax.jit(model.apply)(params, x)
        assert psnr(np.asarray(out), np.asarray(ref)) >= 35
