"""Golden parity for the remaining architecture zoo (SRResNet, PPON, PAN,
pix2pix UNet, CycleGAN ResNet-9, WBC pt/tf) incl. the guided-filter stage."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
from innfer_tpu.loader import load_model, load_model_from_state
from innfer_tpu.ops.filters import guided_filter

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def psnr(a, b, peak=None):
    if peak is None:
        peak = max(1.0, float(np.abs(b).max()))
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(peak ** 2 / mse)


def load_fixture(name):
    fx = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    meta = json.loads(str(fx["meta"]))
    return fx, meta


def run_explicit(name, min_psnr=80.0, out_key="output", out_index=None,
                 strict=True, extra_cfg=None):
    """Build from the fixture's explicit full config (meta['cfg'])."""
    fx, meta = load_fixture(name)
    state = load_checkpoint(os.path.join(GOLDENS, f"{name}.pth"))
    cfg = dict(meta["cfg"])
    if extra_cfg:
        cfg.update(extra_cfg)
    if not meta.get("meval", True):
        cfg["meval"] = False
    model, params = load_model_from_state(state, cfg, strict=strict)
    x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
    out = jax.jit(model.apply)(params, x)
    if out_index is not None:
        out = out[out_index]
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    ref = fx[out_key]
    assert out_nchw.shape == ref.shape, (out_nchw.shape, ref.shape)
    p = psnr(out_nchw, ref)
    assert p >= min_psnr, f"{name}[{out_key}]: PSNR {p:.2f} dB < {min_psnr}"
    return out, fx, model, params, x


class TestSRResNet:
    @pytest.mark.parametrize("name", ["srresnet_x4", "srresnet_x2"])
    def test_parity(self, name):
        run_explicit(name)

    def test_autodetect(self):
        fx, meta = load_fixture("srresnet_x4")
        model, params = load_model(os.path.join(GOLDENS, "srresnet_x4.pth"))
        assert model.name == "sr_resnet" and model.scale == 4
        x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        out = np.transpose(np.asarray(jax.jit(model.apply)(params, x)), (0, 3, 1, 2))
        assert psnr(out, fx["output"]) >= 80


class TestPPON:
    def test_three_outputs(self):
        # fp16 checkpoint -> fp16-resolution parity bar (still >= 60 dB)
        for idx, key in enumerate(["output_0", "output_1", "output_2"]):
            run_explicit("ppon_x4", min_psnr=55.0, out_key=key, out_index=idx)

    def test_autodetect_uses_defaults(self):
        # fingerprint 'CFEM.0.weight' -> ppon with library defaults (nb=24);
        # our fixture has nb=2 so full auto-loading would mismatch — check
        # the fingerprint only.
        from innfer_tpu.checkpoint.detect import fingerprint_arch

        state = load_checkpoint(os.path.join(GOLDENS, "ppon_x4.pth"))
        assert fingerprint_arch(state)[0] == "ppon"


class TestPAN:
    @pytest.mark.parametrize("name", ["pan_x4", "pan_x2"])
    def test_parity(self, name):
        run_explicit(name, min_psnr=70.0)

    def test_fingerprint(self):
        from innfer_tpu.checkpoint.detect import fingerprint_arch

        state = load_checkpoint(os.path.join(GOLDENS, "pan_x4.pth"))
        assert fingerprint_arch(state)[0] == "pan"


class TestUNet:
    def test_parity_trainmode_bn(self):
        run_explicit("unet128")


class TestCycleGAN:
    def test_parity(self):
        run_explicit("cyclegan9", strict=False)


class TestWBC:
    @pytest.mark.parametrize("name,mode", [("wbc_pt", "pt"), ("wbc_tf", "tf")])
    def test_parity(self, name, mode):
        out, fx, model, params, x = run_explicit(name)
        assert model.cfg["mode"] == mode
        # guided-filter post stage (r=1, eps=5e-3; reference run.py:427-429)
        gf = guided_filter(x, out, r=1, eps=5e-3)
        gf_nchw = np.transpose(np.asarray(gf), (0, 3, 1, 2))
        p = psnr(gf_nchw, fx["output_gf"])
        assert p >= 70, f"{name} guided filter PSNR {p:.2f}"

    def test_autodetect(self):
        model, params = load_model(os.path.join(GOLDENS, "wbc_pt.pth"))
        assert model.name == "wbcunet_net"
        assert model.cfg["nf"] == 8


class TestImprovedInference:
    """Shape-based PPON/PAN hyperparameter recovery — an improvement over
    the reference, which falls back to library defaults (run.py:157-163)."""

    def test_pan_full_auto(self):
        fx, meta = load_fixture("pan_x4")
        model, params = load_model(os.path.join(GOLDENS, "pan_x4.pth"))
        assert model.name == "pan_net"
        assert model.cfg["nb"] == 2 and model.cfg["nf"] == 8 and model.cfg["unf"] == 6
        assert model.scale == 4 and model.cfg["self_attention"] is True
        x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        out = np.transpose(np.asarray(jax.jit(model.apply)(params, x)), (0, 3, 1, 2))
        assert psnr(out, fx["output"]) >= 70

    def test_ppon_full_auto(self):
        fx, meta = load_fixture("ppon_x4")
        model, params = load_model(os.path.join(GOLDENS, "ppon_x4.pth"))
        assert model.name == "ppon"
        assert model.cfg["nb"] == 2 and model.cfg["nf"] == 64
        assert model.scale == 4 and model.output_index == 2
        x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        out = jax.jit(model.apply)(params, x)[2]
        out = np.transpose(np.asarray(out), (0, 3, 1, 2))
        assert psnr(out, fx["output_2"]) >= 55  # fp16 fixture


class TestOutm:
    def test_outm_clamp_and_tanh(self):
        from innfer_tpu.checkpoint.torch_pickle import load_checkpoint

        fx, meta = load_fixture("esrgan_x2")
        state = load_checkpoint(os.path.join(GOLDENS, "esrgan_x2.pth"))
        x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
        for outm, check in [
            ("clamp", lambda o: (o.min() >= 0) and (o.max() <= 1)),
            ("tanh", lambda o: (o.min() >= -1) and (o.max() <= 1)),
            ("sigmoid", lambda o: (o.min() >= 0) and (o.max() <= 1)),
            ("scaltanh", lambda o: (o.min() >= 0) and (o.max() <= 1)),
        ]:
            cfg = dict(meta["cfg"], outm=outm)
            model, params = load_model_from_state(state, cfg)
            out = np.asarray(jax.jit(model.apply)(params, x))
            assert check(out), outm


class TestScale3:
    """upscale=3 uses a single 3x upsample block (RRDBNet_arch.py:21-23,37-38);
    scale inference can't see it (run.py:121-128), so the explicit-config path
    is exercised (filename '3x_' provides the scale in the CLI)."""

    @pytest.mark.parametrize("name", ["esrgan_x3", "srresnet_x3"])
    def test_parity(self, name):
        run_explicit(name)


class TestMoreVariants:
    def test_esrgan_lite(self):
        run_explicit("esrganlite_x4")

    def test_unet256_depth8(self):
        run_explicit("unet256")

    def test_cyclegan_6blocks(self):
        run_explicit("cyclegan6", strict=False)
