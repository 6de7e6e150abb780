"""Model-level golden parity: our JAX forwards vs reference PyTorch fp32.

Fixtures in tests/goldens/ were produced by tools/make_goldens.py running the
actual reference implementation.  The acceptance bar is the BASELINE.json
fidelity target: PSNR >= 60 dB vs the PyTorch fp32 output (we assert much
tighter than that in fp32).
"""
import json
import os

import numpy as np
import pytest

import jax

from innfer_tpu.loader import load_model

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def psnr(a, b, peak=1.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(peak ** 2 / mse)


def run_case(name, arch="infer", min_psnr=80.0, output_key="output", output_index=None):
    fx = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    meta = json.loads(str(fx["meta"]))
    x_nchw = fx["input"]
    ref = fx[output_key]

    model, params = load_model(os.path.join(GOLDENS, f"{name}.pth"), arch=arch)
    x = jax.numpy.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    out = jax.jit(model.apply)(params, x)
    if output_index is not None:
        out = out[output_index]
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))

    assert out_nchw.shape == ref.shape, (out_nchw.shape, ref.shape)
    p = psnr(out_nchw, ref, peak=max(1.0, np.abs(ref).max()))
    assert p >= min_psnr, f"{name}: PSNR {p:.2f} dB < {min_psnr}"
    return p, meta, model


class TestRRDB:
    @pytest.mark.parametrize("name", ["esrgan_x4", "esrgan_x2", "esrgan_x1"])
    def test_scales(self, name):
        p, meta, model = run_case(name)
        assert model.scale == meta["scale"]

    def test_plus(self):
        run_case("esrgan_plus_x2")

    def test_nr2(self):
        # nr=2 uses the RDBs.<i> naming; auto-infer cannot know nr, so load
        # with explicit config via arch alias + nr in state is not exposed —
        # exercise through explicit config instead.
        import json as _json
        fx = np.load(os.path.join(GOLDENS, "esrgan_nr2_x2.npz"))
        meta = _json.loads(str(fx["meta"]))
        from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
        from innfer_tpu.loader import load_model_from_state

        state = load_checkpoint(os.path.join(GOLDENS, "esrgan_nr2_x2.pth"))
        cfg = dict(meta["cfg"])
        model, params = load_model_from_state(state, cfg)
        x = jax.numpy.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        out = np.transpose(np.asarray(jax.jit(model.apply)(params, x)), (0, 3, 1, 2))
        assert psnr(out, fx["output"], peak=max(1.0, np.abs(fx["output"]).max())) >= 80

    def test_fp16_checkpoint(self):
        # fp16 weights: parity bar is fp16 resolution, still far above 60 dB
        run_case("esrgan_x4_fp16", min_psnr=60.0)

    def test_evsrgan_conv3d(self):
        # evsrgan: Conv3D RRDB over video clips (reference defaults.py:35-38;
        # library-level only — the reference CLI itself cannot feed 5D).
        fx = np.load(os.path.join(GOLDENS, "evsrgan_x2.npz"))
        ref = fx["output"]  # NCDHW
        meta = json.loads(str(fx["meta"]))
        from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
        from innfer_tpu.loader import load_model_from_state

        state = load_checkpoint(os.path.join(GOLDENS, "evsrgan_x2.pth"))
        model, params = load_model_from_state(state, dict(meta["cfg"]))
        x = jax.numpy.asarray(np.transpose(fx["input"], (0, 2, 3, 4, 1)))
        out = jax.jit(model.apply)(params, x)
        out_ncdhw = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
        assert out_ncdhw.shape == ref.shape, (out_ncdhw.shape, ref.shape)
        p = psnr(out_ncdhw, ref, peak=max(1.0, np.abs(ref).max()))
        assert p >= 80.0, f"evsrgan: PSNR {p:.2f} dB"

    def test_swa_checkpoint(self):
        run_case("esrgan_x4_swa")

    def test_legacy_format(self):
        run_case("esrgan_x4_legacy")

    def test_mesrgan_autoconvert(self):
        # modified layout fingerprints as conv_first -> mod2normal -> esrgan
        run_case("mesrgan_x4")


def run_case_cfg(name, min_psnr=80.0):
    """Parity via the explicit-config path (meta carries the reference's
    full get_network_G_config output, incl. mode/norm_type/act_type)."""
    from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
    from innfer_tpu.loader import load_model_from_state

    fx = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    meta = json.loads(str(fx["meta"]))
    state = load_checkpoint(os.path.join(GOLDENS, f"{name}.pth"))
    cfg = dict(meta["cfg"])
    cfg["meval"] = meta.get("meval", True)
    model, params = load_model_from_state(state, cfg)
    x = jax.numpy.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
    out = np.transpose(np.asarray(jax.jit(model.apply)(params, x)), (0, 3, 1, 2))
    ref = fx["output"]
    assert out.shape == ref.shape, (out.shape, ref.shape)
    p = psnr(out, ref, peak=max(1.0, np.abs(ref).max()))
    assert p >= min_psnr, f"{name}: PSNR {p:.2f} dB < {min_psnr}"
    return p


class TestConvBlockVariants:
    """Config-reachable conv_block variants: mode CNA/NAC/CNAC, batch /
    instance norm layers, prelu/swish parameterized activations, and the PAN
    bilinear trunk upsample (VERDICT round-1 gaps #2-#5)."""

    @pytest.mark.parametrize("name", [
        "esrgan_bn_x2", "esrgan_in_x2", "esrgan_nac_bn_x2",
        "esrgan_prelu_x2", "esrgan_swish_x2",
        "srresnet_bn_x2", "srresnet_nac_bn_x2", "srresnet_cnac_bn_x2",
        "pan_bilinear_x4",
        "cyclegan_zero", "cyclegan_dropout", "cyclegan_bn_train",
        "cyclegan_bn_eval",
    ])
    def test_variant(self, name):
        run_case_cfg(name)

    def test_cyclegan_bn_eval_nonstrict_keeps_running_stats(self):
        """EVAL-mode BN resnet under the cyclegan preset's NON-STRICT load
        (pipeline CYCLEGAN_EXTRAS): running stats must survive conversion —
        only INSTANCE-norm stats are vestigial — and drive F.batch_norm.
        Dropping them silently fell back to per-image statistics, diverging
        from the reference (fixed round 5, resnet.py ignore_key_patterns)."""
        from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
        from innfer_tpu.loader import load_model_from_state

        fx = np.load(os.path.join(GOLDENS, "cyclegan_bn_eval.npz"))
        meta = json.loads(str(fx["meta"]))
        state = load_checkpoint(os.path.join(GOLDENS, "cyclegan_bn_eval.pth"))
        cfg = dict(meta["cfg"])
        cfg["meval"] = True
        model, params = load_model_from_state(state, cfg, strict=False)
        assert any(k.endswith("running_mean") for k in params)
        x = jax.numpy.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        out = np.transpose(
            np.asarray(jax.jit(model.apply)(params, x)), (0, 3, 1, 2))
        ref = fx["output"]
        p = psnr(out, ref, peak=max(1.0, np.abs(ref).max()))
        assert p >= 80, f"non-strict BN-eval PSNR {p:.2f} dB"


class TestBF16Fidelity:
    def test_bf16_pipeline_psnr(self):
        """bf16 compute (the TPU replacement for the reference's fp16) must
        stay visually lossless vs fp32 — quantified, unlike the reference's
        qualitative claim (README.md:20)."""
        import jax.numpy as jnp

        fx = np.load(os.path.join(GOLDENS, "esrgan_x4.npz"))
        model, params = load_model(os.path.join(GOLDENS, "esrgan_x4.pth"))
        x32 = jax.numpy.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        out32 = np.asarray(jax.jit(model.apply)(params, x32))

        from innfer_tpu.models.base import cast_params

        pb = cast_params(params, jnp.bfloat16)
        out16 = np.asarray(
            jax.jit(model.apply)(pb, x32.astype(jnp.bfloat16)), np.float32)
        p = psnr(out16, out32, peak=1.0)
        # measured 75.2 dB; assert well above the ~40 dB visually-lossless
        # bar so a large silent precision regression fails loudly
        assert p > 60, f"bf16 vs fp32 PSNR {p:.1f} dB"
