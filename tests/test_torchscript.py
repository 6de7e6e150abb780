"""TorchScript compatibility stage (innfer_tpu/compat/torchscript.py).

Reference parity target: the `-a ts` path (run.py:40-42) — torch.jit
archives execute on host torch-CPU while pre/post, tiling, recompose and
chaining stay TPU-native.  Fixtures are scripted in-test (tiny random
modules saved to tmp); torch (CPU) is a test/compat dependency only.
"""
import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from innfer_tpu.compat.torchscript import TorchScriptStage, is_torchscript
from innfer_tpu.pipeline import InferenceSession, select_presets

GOLDENS = osp.join(osp.dirname(__file__), "goldens")


class _Pointwise(torch.nn.Module):
    """1x1 conv, scale 1: tiled output == whole output exactly (no halo)."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 3, 1)

    def forward(self, x):
        return self.conv(x)


class _Up2(torch.nn.Module):
    """3x3 conv + PixelShuffle: a 2x SR net for scale probing."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 12, 3, padding=1)
        self.ps = torch.nn.PixelShuffle(2)

    def forward(self, x):
        return self.ps(self.conv(x))


def _save_ts(tmp_path, module, name):
    torch.manual_seed(0)
    path = str(tmp_path / name)
    torch.jit.script(module).save(path)
    return path


def _write_png(path, h, w, seed=0):
    import cv2

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    cv2.imwrite(str(path), img)
    return img


def test_is_torchscript_fingerprint(tmp_path):
    ts = _save_ts(tmp_path, _Pointwise(), "m.pt")
    assert is_torchscript(ts)
    assert not is_torchscript(osp.join(GOLDENS, "esrgan_x2.pth"))
    (tmp_path / "junk.pt").write_bytes(b"not a zip")
    assert not is_torchscript(str(tmp_path / "junk.pt"))


def test_scale_probe(tmp_path):
    st1 = TorchScriptStage(_save_ts(tmp_path, _Pointwise(), "a.pt"))
    st2 = TorchScriptStage(_save_ts(tmp_path, _Up2(), "b.pt"))
    assert st1.model.scale == 1
    assert st2.model.scale == 2


def test_chop_equals_whole_for_pointwise(tmp_path):
    """1x1 conv has no receptive-field halo: the tiled path must equal the
    whole-image path bitwise (validates extract/forward/recompose glue)."""
    ts = _save_ts(tmp_path, _Pointwise(), "m.pt")
    x = jnp.asarray(np.random.default_rng(1).random((1, 70, 90, 3)),
                    jnp.float32)
    whole = TorchScriptStage(ts, chop=False)(x)
    tiled = TorchScriptStage(ts, chop=True, tile=32, overlap=8)(x)
    assert tiled.shape == whole.shape == (1, 70, 90, 3)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(whole),
                               atol=1e-6, rtol=0)


def test_session_e2e_sr(tmp_path):
    """Full directory run through InferenceSession with arch auto-detected
    from the archive fingerprint (no -a ts needed)."""
    ts = _save_ts(tmp_path, _Up2(), "2x_up.pt")
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    _write_png(inp / "a.png", 40, 56)
    sess = InferenceSession(ts, compute_dtype=jnp.float32, tile=32, overlap=8)
    written = sess.process(str(inp), str(out), verbose=False)
    import cv2

    assert cv2.imread(written[0]).shape == (80, 112, 3)


def test_cli_arch_ts(tmp_path):
    from innfer_tpu.cli import main

    ts = _save_ts(tmp_path, _Up2(), "2x_up.pt")
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    _write_png(inp / "img.png", 20, 28)
    rc = main(["-m", ts, "-a", "ts", "-i", str(inp), "-o", str(out), "-cpu"])
    assert rc == 0
    import cv2

    assert cv2.imread(str(out / "img.png")).shape == (40, 56, 3)


def test_chain_with_jax_stage_disables_fusion(tmp_path):
    """ts + state-dict chain: fused tile-through-chain must auto-disable
    (host stages cannot run inside the jitted tile pass), and the
    sequential chain must produce the combined scale."""
    ts = _save_ts(tmp_path, _Pointwise(), "1x_pre.pt")
    chain = ts + "+" + osp.join(GOLDENS, "esrgan_x2.pth")
    sess = InferenceSession(chain, compute_dtype=jnp.float32,
                            tile=16, overlap=8)
    assert sess._fused_runner is None
    assert sess.total_scale == 2
    img = np.random.default_rng(2).integers(0, 256, (24, 20, 3), dtype=np.uint8)
    out = sess.run_image(img)
    assert out.shape == (48, 40, 3)
    with pytest.raises(ValueError, match="TorchScript"):
        InferenceSession(chain, compute_dtype=jnp.float32, fused_chain=True)


def test_run_batch_forces_whole(tmp_path):
    ts = _save_ts(tmp_path, _Up2(), "2x.pt")
    p = select_presets("infer")
    p.chop = False  # whole-image both ways (batched runs force_whole)
    sess = InferenceSession(ts, presets=p, compute_dtype=jnp.float32)
    imgs = [np.random.default_rng(s).integers(0, 256, (24, 20, 3),
                                              dtype=np.uint8)
            for s in (1, 2)]
    outs = sess.run_batch(imgs)
    assert all(o.shape == (48, 40, 3) for o in outs)
    solo = [sess.run_image(im) for im in imgs]
    for b, s in zip(outs, solo):
        assert np.abs(b.astype(int) - s.astype(int)).max() <= 1


def test_multi_output_module_rejected(tmp_path):
    class TwoOut(torch.nn.Module):
        def forward(self, x):
            return x, x

    path = str(tmp_path / "two.pt")
    torch.jit.script(TwoOut()).save(path)
    with pytest.raises(ValueError, match="multi-output"):
        TorchScriptStage(path)
