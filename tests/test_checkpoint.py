"""Checkpoint subsystem tests: torch-free .pth reading, remaps, detection."""
import numpy as np
import pytest
import torch

from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
from innfer_tpu.checkpoint.remaps import swa_to_normal, mod_to_normal, normal_to_mod
from innfer_tpu.checkpoint.detect import fingerprint_arch, infer_params


def _roundtrip(tmp_path, obj, legacy=False):
    p = str(tmp_path / ("ck_legacy.pth" if legacy else "ck.pth"))
    torch.save(obj, p, _use_new_zipfile_serialization=not legacy)
    return load_checkpoint(p)


@pytest.mark.parametrize("legacy", [False, True])
def test_load_roundtrip_dtypes(tmp_path, rng, legacy):
    obj = {
        "a.weight": torch.from_numpy(rng.standard_normal((4, 3, 3, 3), dtype=np.float32)),
        "a.bias": torch.from_numpy(rng.standard_normal(4, dtype=np.float32)),
        "h": torch.from_numpy(rng.standard_normal((2, 5), dtype=np.float32)).half(),
        "b16": torch.from_numpy(rng.standard_normal((3, 3), dtype=np.float32)).bfloat16(),
        "i": torch.arange(10, dtype=torch.int64),
        "scalar": torch.tensor(7, dtype=torch.int64),
    }
    state = _roundtrip(tmp_path, obj, legacy=legacy)
    assert set(state) == set(obj)
    for k in obj:
        ours = np.asarray(state[k], dtype=np.float64)
        theirs = obj[k].float().numpy().astype(np.float64) if obj[k].is_floating_point() else obj[k].numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_load_noncontiguous_view(tmp_path, rng):
    base = torch.from_numpy(rng.standard_normal((8, 8), dtype=np.float32))
    view = base.t()  # non-contiguous
    state = _roundtrip(tmp_path, {"v": view})
    np.testing.assert_array_equal(state["v"], view.numpy())


def test_load_shared_storage(tmp_path, rng):
    base = torch.from_numpy(rng.standard_normal(16, dtype=np.float32))
    obj = {"full": base, "half1": base[:8], "half2": base[8:]}
    state = _roundtrip(tmp_path, obj)
    np.testing.assert_array_equal(state["half2"], base[8:].numpy())


def test_load_shared_storage_legacy(tmp_path, rng):
    """Tied weights in the legacy format: BINPERSID is not memoized, so the
    same storage key arrives twice; both tensors must materialize."""
    base = torch.from_numpy(rng.standard_normal(16, dtype=np.float32))
    obj = {"a": base, "b": base, "tail": base[8:]}
    state = _roundtrip(tmp_path, obj, legacy=True)
    for k in ("a", "b"):
        assert isinstance(state[k], np.ndarray), type(state[k])
        np.testing.assert_array_equal(state[k], base.numpy())
    np.testing.assert_array_equal(state["tail"], base[8:].numpy())


def test_zip_shared_storage_aliases_one_buffer(tmp_path, rng):
    """zip-format BINPERSID memoization: tensors sharing one storage must
    alias ONE materialized buffer (tied weights would otherwise re-read
    and re-materialize the zip entry per reference)."""
    base = torch.from_numpy(rng.standard_normal(12, dtype=np.float32))
    obj = {"a": base, "b": base.view(3, 4)}
    state = _roundtrip(tmp_path, obj)
    np.testing.assert_array_equal(np.asarray(state["b"]).ravel(), base.numpy())
    assert np.shares_memory(np.asarray(state["a"]), np.asarray(state["b"]))


def test_writer_preserves_zero_dim(tmp_path):
    """np.ascontiguousarray promotes 0-d arrays to shape (1,): scalar
    entries (BN num_batches_tracked, SWA n_averaged) must round-trip
    rank-0 through the writer, for torch and for our reader alike."""
    from innfer_tpu.checkpoint.writer import write_checkpoint

    p = str(tmp_path / "zd.pth")
    write_checkpoint(p, {"n": np.array(5, np.int64),
                         "w": np.ones((2, 2), np.float32)})
    ours = load_checkpoint(p)
    assert np.asarray(ours["n"]).shape == ()
    assert int(np.asarray(ours["n"])) == 5
    theirs = torch.load(p, weights_only=True)
    assert tuple(theirs["n"].shape) == ()
    assert int(theirs["n"]) == 5


def test_writer_large_ints_long1():
    """ints outside signed 32-bit must be emitted as LONG1, not struct '<i'."""
    import pickle

    from innfer_tpu.checkpoint.writer import _Opcodes

    for v in (7, 300, 70000, 2 ** 31 - 1, 2 ** 31, 2 ** 40 + 123):
        ops = _Opcodes()
        ops.int_(v)
        assert pickle.loads(bytes(ops.out) + b".") == v


def test_infer_ignores_stray_three_part_keys(rng):
    """A state dict that fingerprints as esrgan but carries an extra
    non-positional 3-part key must not crash positional inference."""
    import math

    from tools.synth_params import esrgan_state

    state = {k: np.asarray(v) for k, v in
             esrgan_state(nb=2, nf=8, gc=4, scale=2).items()}
    state["module.conv_first.weight"] = np.zeros((8, 3, 3, 3), np.float32)
    arch, state = fingerprint_arch(state)
    assert arch == "esrgan"
    cfg = infer_params(arch, state, None)
    assert cfg["nb"] == 2 and cfg["upscale"] == 2


def test_rejects_arbitrary_globals(tmp_path):
    import pickle, zipfile
    p = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": print}))
    with pytest.raises(Exception):
        load_checkpoint(p)


def test_nested_state_dict_unwrap(tmp_path, rng):
    w = torch.from_numpy(rng.standard_normal((2, 2), dtype=np.float32))
    state = _roundtrip(tmp_path, {"params_ema": {"w": w}})
    assert list(state) == ["w"]


def test_swa_unwrap():
    state = {
        "n_averaged": np.array(5),
        "module.module.model.0.weight": np.ones(3),
        "stray": np.zeros(2),
    }
    out = swa_to_normal(state)
    assert list(out) == ["model.0.weight"]


def test_mod_normal_roundtrip(rng):
    # build a mesrgan-layout dict with nb=2
    state = {"conv_first.weight": rng.standard_normal((8, 3, 3, 3)),
             "conv_first.bias": rng.standard_normal(8)}
    for i in range(2):
        for j in (1, 2, 3):
            for c in range(1, 6):
                state[f"RRDB_trunk.{i}.RDB{j}.conv{c}.weight"] = rng.standard_normal((4, 8, 3, 3))
                state[f"RRDB_trunk.{i}.RDB{j}.conv{c}.bias"] = rng.standard_normal(4)
    for stem in ("trunk_conv", "upconv1", "upconv2", "HRconv", "conv_last"):
        state[f"{stem}.weight"] = rng.standard_normal((8, 8, 3, 3))
        state[f"{stem}.bias"] = rng.standard_normal(8)

    flat = mod_to_normal(state)
    assert "model.0.weight" in flat
    assert "model.1.sub.0.RDB1.conv1.0.weight" in flat
    assert "model.1.sub.2.weight" in flat  # trunk conv at nb=2
    assert "model.10.weight" in flat
    back = normal_to_mod(flat)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])


def test_fingerprints():
    assert fingerprint_arch({"SCPA_trunk.0.conv1_a.weight": 0})[0] == "pan"
    assert fingerprint_arch({"model.1.sub.0.res.0.weight": 0})[0] == "srgan"
    assert fingerprint_arch({"model.0.weight": 0})[0] == "esrgan"
    assert fingerprint_arch({"CFEM.0.weight": 0})[0] == "ppon"
    assert fingerprint_arch({"conv_9.weight": 0})[0] == "wbcunet"
    with pytest.raises(ValueError):
        fingerprint_arch({"unknown.weight": 0})


def _fake_esrgan_state(nb=23, nf=64, scale=4, in_nc=3, out_nc=3, plus=False):
    """Flattened-layout key skeleton with correctly-shaped model.0 / last convs."""
    state = {"model.0.weight": np.zeros((nf, in_nc, 3, 3)), "model.0.bias": np.zeros(nf)}
    for i in range(nb):
        state[f"model.1.sub.{i}.RDB1.conv1.0.weight"] = np.zeros((32, nf, 3, 3))
        if plus:
            state[f"model.1.sub.{i}.RDB1.conv1x1.weight"] = np.zeros((32, nf, 1, 1))
    state[f"model.1.sub.{nb}.weight"] = np.zeros((nf, nf, 3, 3))
    import math
    n_up = int(math.log2(scale)) if scale > 1 else 0
    idx = 2
    for _ in range(n_up):
        idx += 1  # upsample module
        state[f"model.{idx}.weight"] = np.zeros((nf, nf, 3, 3))
        idx += 2  # conv + act
    state[f"model.{idx}.weight"] = np.zeros((nf, nf, 3, 3))  # HR0
    idx += 2
    state[f"model.{idx}.weight"] = np.zeros((out_nc, nf, 3, 3))  # HR1
    return state


@pytest.mark.parametrize("scale", [1, 2, 4, 8])
def test_infer_scale_nb_nf(scale):
    state = _fake_esrgan_state(nb=11, nf=32, scale=scale)
    cfg = infer_params("esrgan", state)
    assert cfg["upscale"] == scale
    assert cfg["nb"] == 11
    assert cfg["nf"] == 32
    assert cfg["plus"] is False


def test_infer_plus_and_out_nc():
    cfg = infer_params("esrgan", _fake_esrgan_state(plus=True, out_nc=4))
    assert cfg["plus"] is True
    assert cfg["out_nc"] == 4


def test_infer_wbc():
    cfg = infer_params("wbcunet", {"conv.weight": np.zeros((32, 3, 7, 7)), "conv_9.weight": np.zeros((3, 32, 7, 7))})
    assert cfg["type"] == "wbcunet_net" and cfg["nf"] == 32


def test_legacy_header_rejects_globals(tmp_path):
    """The legacy format's header pickles must not execute code either."""
    import pickle

    p = str(tmp_path / "evil_legacy.pth")
    with open(p, "wb") as f:
        pickle.dump(0x1950A86A20F9469CFC6C, f)  # valid magic
        f.write(pickle.dumps(print))  # malicious 'protocol version'
    with pytest.raises(Exception):
        load_checkpoint(p)


def test_explicit_scale_vs_positional_inference(rng):
    """3x checkpoints look like 2x to the positional trick (run.py:121-128):
    an explicit/filename scale wins inside that {2,3} ambiguity class, but a
    scale contradicting the layout is rejected (it could not load)."""
    state = _fake_esrgan_state(nb=2, nf=16, scale=2)
    assert infer_params("esrgan", state, scale=3)["upscale"] == 3
    assert infer_params("esrgan", state)["upscale"] == 2
    # contradiction: forcing 2 onto a 4x layout keeps the inferred 4
    state4 = _fake_esrgan_state(nb=2, nf=16, scale=4)
    assert infer_params("esrgan", state4, scale=2)["upscale"] == 4


def test_torchscript_rejected(tmp_path):
    """TorchScript archives embed torch bytecode and cannot run TPU-native;
    the loader must reject them clearly (reference '-a ts', run.py:40-42)."""
    class M(torch.nn.Module):
        def forward(self, x):
            return x * 2

    p = str(tmp_path / "scripted.pt")
    torch.jit.script(M()).save(p)
    with pytest.raises(ValueError, match="TorchScript"):
        load_checkpoint(p)


def test_arch_config_mismatch_error_is_actionable(tmp_path):
    """An explicit arch whose library-default hyperparameters don't match
    the checkpoint must fail pointing at -a infer, not with a bare
    KeyError (reference crashes inside load_state_dict, run.py:157-163)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    import os.path as osp

    from innfer_tpu.loader import load_model

    goldens = osp.join(osp.dirname(__file__), "goldens")
    # goldens/ppon_x4.pth is tiny (nb<24); '-a ppon' defaults to nb=24
    model, params = load_model(
        osp.join(goldens, "ppon_x4.pth"), arch="ppon", strict=False)
    with pytest.raises(KeyError, match="-a infer"):
        jax.jit(model.apply)(params, jnp.zeros((1, 16, 16, 3), jnp.float32))
