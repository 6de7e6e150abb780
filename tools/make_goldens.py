"""Generate golden parity fixtures by running the REFERENCE implementation.

Run on a machine where /root/reference (victorca25/iNNfer) is mounted:

    python tools/make_goldens.py

For each case this saves into tests/goldens/:
  <case>.pth   — a tiny random-init checkpoint in the torch format the
                 reference would consume
  <case>.npz   — input tensor (NCHW fp32), reference fp32 output(s), and a
                 JSON meta blob (arch config, scale, eval mode)

The fixtures are DATA generated from the reference's behavior; no reference
code is copied into this repository.  Tests (tests/test_model_parity.py)
compare our JAX forwards against these outputs at >= 60 dB PSNR.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import torch

REF = os.environ.get("REFERENCE_PATH", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

sys.path.insert(0, REF)

from architectures import get_network  # noqa: E402  (reference factory)
from utils.defaults import get_network_G_config  # noqa: E402
from utils.utils import guided_filter  # noqa: E402


def perturb_norm_state(net, seed):
    """Randomize BN running stats + 1-dim affine params so that norm layers
    are numerically meaningful in eval mode (fresh running stats are the
    0-mean/1-var identity, which would not catch mis-wired norm keys)."""
    g = torch.Generator().manual_seed(seed * 1000 + 7)
    state = net.state_dict()
    for k, v in state.items():
        if k.endswith("running_mean"):
            state[k] = torch.randn(v.shape, generator=g) * 0.2
        elif k.endswith("running_var"):
            state[k] = torch.rand(v.shape, generator=g) * 0.8 + 0.4
        elif v.ndim == 1 and k.endswith(".weight"):
            state[k] = torch.randn(v.shape, generator=g) * 0.3 + 1.0
        elif v.ndim == 1 and k.endswith(".bias"):
            state[k] = torch.randn(v.shape, generator=g) * 0.2
    net.load_state_dict(state)


def save_case(name, net_cfg, scale, in_hw, *, meval=True, seed=0, half=False,
              input_range=(0.0, 1.0), wrap_swa=False, legacy=False,
              extra_outputs=None, in_nc=3, perturb=False):
    torch.manual_seed(seed)
    cfg = get_network_G_config(dict(net_cfg), scale)
    net = get_network(dict(cfg))
    if perturb:
        perturb_norm_state(net, seed)
    if meval:
        net.eval()
    else:
        net.train()
    for p in net.parameters():
        p.requires_grad = False

    h, w = in_hw
    lo, hi = input_range
    x = torch.rand(1, in_nc, h, w) * (hi - lo) + lo

    with torch.no_grad():
        y = net(x)

    outputs = {}
    if isinstance(y, tuple):
        for i, yi in enumerate(y):
            outputs[f"output_{i}"] = yi.numpy().astype(np.float32)
        y_main = y[2]
    else:
        outputs["output"] = y.numpy().astype(np.float32)
        y_main = y

    if extra_outputs == "guided_filter":
        with torch.no_grad():
            gf = guided_filter(x, y_main, r=1, eps=5e-3)
        outputs["output_gf"] = gf.numpy().astype(np.float32)

    state = net.state_dict()
    if half:
        state = {k: v.half() for k, v in state.items()}
    if wrap_swa:
        state = {"module.module." + k: v for k, v in state.items()}
        state["n_averaged"] = torch.tensor(3)

    os.makedirs(OUT, exist_ok=True)
    torch.save(state, os.path.join(OUT, f"{name}.pth"),
               _use_new_zipfile_serialization=not legacy)
    meta = {"cfg": cfg, "scale": scale, "meval": meval, "arch": net_cfg.get("type")}
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"),
        input=x.numpy().astype(np.float32),
        meta=json.dumps(meta),
        **outputs,
    )
    n_params = sum(v.numel() for v in state.values() if v.ndim > 0)
    print(f"{name}: cfg={meta['arch']} scale={scale} in={tuple(x.shape)} params={n_params}")


def save_mesrgan_case(name, nb, nf, in_hw, seed=0):
    """MRRDBNet saved in the modified layout (conv_first fingerprint)."""
    torch.manual_seed(seed)
    cfg = get_network_G_config({"type": "mesrgan", "nb": nb, "nf": nf}, 4)
    net = get_network(dict(cfg)).eval()
    x = torch.rand(1, 3, *in_hw)
    with torch.no_grad():
        y = net(x)
    os.makedirs(OUT, exist_ok=True)
    torch.save(net.state_dict(), os.path.join(OUT, f"{name}.pth"))
    meta = {"cfg": cfg, "scale": 4, "meval": True, "arch": "mesrgan"}
    np.savez_compressed(os.path.join(OUT, f"{name}.npz"), input=x.numpy(),
                        output=y.numpy().astype(np.float32), meta=json.dumps(meta))
    print(f"{name}: mesrgan scale=4 in={tuple(x.shape)}")


def save_chop_case(name, seed=42):
    """Reference chop_forward golden: tiled output + whole-image output."""
    from utils.utils import extract_patches_2d, recompose_tensor  # noqa: E402

    torch.manual_seed(seed)
    h, w, patch_max, step, scale = 24, 40, 16, 0.5, 2
    cfg = get_network_G_config({"type": "esrgan", "nb": 1, "nf": 8}, scale)
    net = get_network(dict(cfg)).eval()
    for p in net.parameters():
        p.requires_grad = False
    x = torch.rand(1, 3, h, w)
    patch = min(h, w, patch_max)
    patches = extract_patches_2d(img=x, patch_shape=(patch, patch),
                                 step=[step, step], batch_first=True).squeeze(0)
    outs = []
    with torch.no_grad():
        whole = net(x)
        for i in range(patches.size(0)):
            outs.append(net(patches[i: i + 1]))
    rec = recompose_tensor(torch.cat(outs, 0), h, w, step=step, scale=scale)
    os.makedirs(OUT, exist_ok=True)
    torch.save(net.state_dict(), os.path.join(OUT, f"{name}.pth"))
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"), input=x.numpy(),
        output=rec.numpy().astype(np.float32),
        whole=whole.numpy().astype(np.float32),
        meta=json.dumps({"cfg": cfg, "scale": scale, "patch": patch,
                         "step": step}))
    print(f"{name}: chop golden, {patches.size(0)} patches")


def main():
    # --- ESRGAN / RRDBNet family ---
    save_case("esrgan_x4", {"type": "esrgan", "nb": 2, "nf": 16}, 4, (24, 24))
    save_case("esrgan_x2", {"type": "esrgan", "nb": 2, "nf": 16}, 2, (20, 28), seed=1)
    save_case("esrgan_x1", {"type": "esrgan", "nb": 2, "nf": 16}, 1, (24, 24), seed=2)
    save_case("esrgan_plus_x2", {"type": "esrgan", "nb": 2, "nf": 16, "plus": True}, 2, (16, 16), seed=3)
    save_case("esrgan_nr2_x2", {"type": "esrgan", "nb": 2, "nf": 16, "nr": 2}, 2, (16, 16), seed=4)
    save_case("esrgan_x4_fp16", {"type": "esrgan", "nb": 1, "nf": 16}, 4, (16, 16), seed=5, half=True)
    save_case("esrgan_x4_swa", {"type": "esrgan", "nb": 1, "nf": 16}, 4, (16, 16), seed=6, wrap_swa=True)
    save_case("esrgan_x4_legacy", {"type": "esrgan", "nb": 1, "nf": 16}, 4, (16, 16), seed=7, legacy=True)
    save_mesrgan_case("mesrgan_x4", nb=2, nf=16, in_hw=(16, 16), seed=8)

    # --- SRResNet / SRGAN ---
    save_case("srresnet_x4", {"type": "srgan", "nb": 3, "nf": 16}, 4, (24, 24), seed=9)
    save_case("srresnet_x2", {"type": "srgan", "nb": 3, "nf": 16}, 2, (20, 24), seed=10)

    # --- PPON (nf fixed at 64 by the hardcoded _ResBlock_32 width) ---
    save_case("ppon_x4", {"type": "ppon", "nb": 2}, 4, (16, 16), seed=11, half=True)

    # --- PAN ---
    save_case("pan_x4", {"type": "pan", "nf": 8, "unf": 6, "nb": 2}, 4, (24, 24), seed=12)
    save_case("pan_x2", {"type": "pan", "nf": 8, "unf": 6, "nb": 2}, 2, (24, 24), seed=13)

    # --- pix2pix UNet (train-mode BN per pix2pix_extras, run.py:299-303) ---
    save_case("unet128", {"type": "unet_128", "ngf": 4}, 1, (128, 128),
              meval=False, seed=14, input_range=(-1.0, 1.0))

    # --- CycleGAN ResNet-9 (instance norm, eval) ---
    save_case("cyclegan9", {"type": "resnet_9blocks", "ngf": 8}, 1, (64, 48),
              seed=15, input_range=(-1.0, 1.0))

    # --- WBC (pt and tf modes) + guided filter end-to-end ---
    save_case("wbc_pt", {"type": "wbcunet", "nf": 8}, 1, (32, 32), meval=False,
              seed=16, input_range=(-1.0, 1.0), extra_outputs="guided_filter")
    save_case("wbc_tf", {"type": "wbcunet_tf", "nf": 8}, 1, (32, 32), meval=False,
              seed=17, input_range=(-1.0, 1.0), extra_outputs="guided_filter")

    # --- scale-3 single-upsampler variants ---
    save_case("esrgan_x3", {"type": "esrgan", "nb": 2, "nf": 16}, 3, (17, 20), seed=21)
    save_case("srresnet_x3", {"type": "srgan", "nb": 2, "nf": 16}, 3, (17, 20), seed=22)

    # --- extra config variants ---
    save_case("esrganlite_x4", {"type": "esrgan-lite", "nb": 2, "nf": 8}, 4, (16, 16), seed=31)
    save_case("unet256", {"type": "unet_256", "ngf": 4}, 1, (256, 256),
              meval=False, seed=32, input_range=(-1.0, 1.0))
    save_case("cyclegan6", {"type": "resnet_6blocks", "ngf": 8}, 1, (48, 64),
              seed=33, input_range=(-1.0, 1.0))

    # --- reference tiled-inference golden ---
    save_chop_case("chop_esrgan_x2")

    main_round2()


def main_round2():
    """Round-2 config-variant fixtures: conv_block mode / norm / act plumbing
    (reference block.py:213-254) + PAN bilinear upsampling."""
    save_case("esrgan_bn_x2", {"type": "esrgan", "nb": 2, "nf": 16,
                               "norm_type": "batch"}, 2, (16, 16),
              seed=41, perturb=True)
    save_case("esrgan_in_x2", {"type": "esrgan", "nb": 2, "nf": 16,
                               "norm_type": "instance"}, 2, (16, 16), seed=42)
    save_case("esrgan_nac_bn_x2", {"type": "esrgan", "nb": 2, "nf": 16,
                                   "norm_type": "batch", "mode": "NAC"},
              2, (16, 16), seed=43, perturb=True)
    save_case("esrgan_prelu_x2", {"type": "esrgan", "nb": 2, "nf": 16,
                                  "act_type": "prelu"}, 2, (16, 16),
              seed=44, perturb=True)
    save_case("esrgan_swish_x2", {"type": "esrgan", "nb": 2, "nf": 16,
                                  "act_type": "swish"}, 2, (16, 16), seed=45)
    save_case("srresnet_bn_x2", {"type": "srgan", "nb": 3, "nf": 16,
                                 "norm_type": "batch"}, 2, (16, 16),
              seed=46, perturb=True)
    save_case("srresnet_nac_bn_x2", {"type": "srgan", "nb": 3, "nf": 16,
                                     "norm_type": "batch", "mode": "NAC"},
              2, (16, 16), seed=47, perturb=True)
    save_case("srresnet_cnac_bn_x2", {"type": "srgan", "nb": 3, "nf": 16,
                                      "norm_type": "batch", "mode": "CNAC"},
              2, (16, 16), seed=48, perturb=True)
    save_case("pan_bilinear_x4", {"type": "pan", "nf": 8, "unf": 6, "nb": 2,
                                  "ups_inter_mode": "bilinear"}, 4, (24, 24),
              seed=49)
    # ResNet generator variants: zero padding (conv_block.0/.3 keys),
    # dropout (index shift, identity in eval), train-mode batch norm
    save_case("cyclegan_zero", {"type": "resnet_6blocks", "ngf": 8,
                                "padding_type": "zero"}, 1, (48, 48),
              seed=50, input_range=(-1.0, 1.0))
    save_case("cyclegan_dropout", {"type": "resnet_6blocks", "ngf": 8,
                                   "use_dropout": True}, 1, (48, 48),
              seed=51, input_range=(-1.0, 1.0))
    save_case("cyclegan_bn_train", {"type": "resnet_6blocks", "ngf": 8,
                                    "norm_type": "batch"}, 1, (48, 48),
              seed=52, input_range=(-1.0, 1.0), meval=False, perturb=True)
    main_round5()


def main_round5():
    """Round-5 fixture: EVAL-mode batch-norm resnet generator.  The
    reference uses the checkpoint's running stats here; until round 5 the
    non-strict preset load dropped them (ignore_key_patterns), silently
    falling back to per-image statistics."""
    save_case("cyclegan_bn_eval", {"type": "resnet_6blocks", "ngf": 8,
                                   "norm_type": "batch"}, 1, (48, 48),
              seed=53, input_range=(-1.0, 1.0), perturb=True)


def save_evsrgan_case(name, nb, nf, in_dhw, scale=2, seed=60):
    """evsrgan (Conv3D RRDB, defaults.py:35-38): 5D NCDHW input.  The
    reference CLI cannot feed it (4D image loop) but the network builds and
    runs; this golden pins the module-level forward."""
    torch.manual_seed(seed)
    cfg = get_network_G_config({"type": "evsrgan", "nb": nb, "nf": nf}, scale)
    net = get_network(dict(cfg)).eval()
    for p in net.parameters():
        p.requires_grad = False
    d, h, w = in_dhw
    x = torch.rand(1, 3, d, h, w)
    with torch.no_grad():
        y = net(x)
    os.makedirs(OUT, exist_ok=True)
    torch.save(net.state_dict(), os.path.join(OUT, f"{name}.pth"))
    meta = {"cfg": cfg, "scale": scale, "meval": True, "arch": "evsrgan"}
    np.savez_compressed(os.path.join(OUT, f"{name}.npz"), input=x.numpy(),
                        output=y.numpy().astype(np.float32),
                        meta=json.dumps(meta))
    print(f"{name}: evsrgan scale={scale} in={tuple(x.shape)} out={tuple(y.shape)}")


def main_round2b():
    save_evsrgan_case("evsrgan_x2", nb=2, nf=8, in_dhw=(3, 12, 12), scale=2)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only-round2", action="store_true",
                    help="generate only the round-2 variant fixtures")
    ap.add_argument("--only-round2b", action="store_true",
                    help="generate only the round-2b fixtures (evsrgan)")
    args = ap.parse_args()
    if args.only_round2:
        main_round2()
    elif args.only_round2b:
        main_round2b()
    else:
        main()
