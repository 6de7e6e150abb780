"""Synthetic (random-init) parameter dicts for benchmarks and dry-runs.

Generates torch-layout state dicts (OIHW, exact reference key naming) for
every architecture family at any size, WITHOUT a checkpoint file, then runs
them through the normal converter — so compiled graphs match real-checkpoint
runs bit-for-bit in structure.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

StateDict = Dict[str, np.ndarray]


class _Maker:
    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)
        self.state: StateDict = {}

    def conv(self, key: str, o: int, i: int, k: int = 3, bias: bool = True):
        std = 1.0 / math.sqrt(i * k * k)
        self.state[f"{key}.weight"] = self.rng.uniform(
            -std, std, size=(o, i, k, k)).astype(np.float32)
        if bias:
            self.state[f"{key}.bias"] = self.rng.uniform(
                -0.01, 0.01, size=(o,)).astype(np.float32)

    def deconv(self, key: str, i: int, o: int, k: int, bias: bool = True):
        std = 1.0 / math.sqrt(i * k * k)
        self.state[f"{key}.weight"] = self.rng.uniform(
            -std, std, size=(i, o, k, k)).astype(np.float32)
        if bias:
            self.state[f"{key}.bias"] = self.rng.uniform(
                -0.01, 0.01, size=(o,)).astype(np.float32)

    def conv1d(self, key: str, o: int, i: int):
        std = 1.0 / math.sqrt(i)
        self.state[f"{key}.weight"] = self.rng.uniform(
            -std, std, size=(o, i, 1)).astype(np.float32)
        self.state[f"{key}.bias"] = self.rng.uniform(
            -0.01, 0.01, size=(o,)).astype(np.float32)

    def norm_affine(self, key: str, c: int, running: bool = True):
        self.state[f"{key}.weight"] = np.ones(c, np.float32)
        self.state[f"{key}.bias"] = np.zeros(c, np.float32)
        if running:
            self.state[f"{key}.running_mean"] = np.zeros(c, np.float32)
            self.state[f"{key}.running_var"] = np.ones(c, np.float32)

    def scalar(self, key: str, v: float = 0.0):
        self.state[key] = np.full((1,), v, np.float32)


def _n_up(scale: int) -> int:
    return 1 if scale == 3 else (0 if scale == 1 else int(math.log2(scale)))


def esrgan_state(nb=23, nf=64, gc=32, in_nc=3, out_nc=3, scale=4, plus=False,
                 seed=0) -> StateDict:
    m = _Maker(seed)
    m.conv("model.0", nf, in_nc)
    for i in range(nb):
        for j in (1, 2, 3):
            p = f"model.1.sub.{i}.RDB{j}"
            for c in range(1, 6):
                m.conv(f"{p}.conv{c}.0", gc if c < 5 else nf, nf + (c - 1) * gc)
            if plus:
                m.conv(f"{p}.conv1x1", gc, nf, k=1, bias=False)
    m.conv(f"model.1.sub.{nb}", nf, nf)
    idx = 2
    for _ in range(_n_up(scale)):
        m.conv(f"model.{idx + 1}", nf, nf)
        idx += 3
    m.conv(f"model.{idx}", nf, nf)
    m.conv(f"model.{idx + 2}", out_nc, nf)
    return m.state


def srresnet_state(nb=16, nf=64, in_nc=3, out_nc=3, scale=4, seed=0) -> StateDict:
    m = _Maker(seed)
    m.conv("model.0", nf, in_nc)
    for i in range(nb):
        m.conv(f"model.1.sub.{i}.res.0", nf, nf)
        m.conv(f"model.1.sub.{i}.res.2", nf, nf)
    m.conv(f"model.1.sub.{nb}", nf, nf)
    idx = 2
    for _ in range(_n_up(scale)):
        factor = 3 if scale == 3 else 2
        m.conv(f"model.{idx}", nf * factor * factor, nf)  # pixelshuffle conv
        idx += 3
    m.conv(f"model.{idx}", nf, nf)
    m.conv(f"model.{idx + 2}", out_nc, nf)
    return m.state


def ppon_state(nb=24, nf=64, in_nc=3, out_nc=3, scale=4, seed=0) -> StateDict:
    m = _Maker(seed)

    def rrblock(prefix):
        for rb in ("RB1", "RB2", "RB3"):
            p = f"{prefix}.{rb}"
            m.conv(f"{p}.c1", nf, nf)
            for r in range(1, 9):
                m.conv(f"{p}.d{r}", nf // 2, nf)
            m.conv(f"{p}.c2", nf, nf * 4, k=1)

    m.conv("CFEM.0", nf, in_nc)
    for i in range(nb):
        rrblock(f"CFEM.1.sub.{i}")
    m.conv(f"CFEM.1.sub.{nb}", nf, nf)
    for i in range(2):
        rrblock(f"SFEM.{i}")
        rrblock(f"PFEM.{i}")
    for mod in ("CRM", "SRM", "PRM"):
        n_up = _n_up(scale)
        for u in range(n_up):
            m.conv(f"{mod}.{3 * u + 1}", nf, nf)
        m.conv(f"{mod}.{3 * n_up}", nf, nf)
        m.conv(f"{mod}.{3 * n_up + 2}", out_nc, nf)
    return m.state


def pan_state(nb=16, nf=40, unf=24, in_nc=3, out_nc=3, scale=4,
              self_attention=True, seed=0) -> StateDict:
    m = _Maker(seed)
    m.conv("conv_first", nf, in_nc)
    for i in range(nb):
        p = f"SCPA_trunk.{i}"
        gw = nf // 2
        m.conv(f"{p}.conv1_a", gw, nf, k=1, bias=False)
        m.conv(f"{p}.conv1_b", gw, nf, k=1, bias=False)
        m.conv(f"{p}.k1.0", gw, gw, bias=False)
        m.conv(f"{p}.PACnv.k2", gw, gw, k=1)
        m.conv(f"{p}.PACnv.k3", gw, gw, bias=False)
        m.conv(f"{p}.PACnv.k4", gw, gw, bias=False)
        m.conv(f"{p}.conv3", nf, nf, k=1, bias=False)
    m.conv("trunk_conv", nf, nf)
    if self_attention:
        m.conv1d("FSA.conv_f", nf // 8, nf)
        m.conv1d("FSA.conv_g", nf // 8, nf)
        m.conv1d("FSA.conv_h", nf, nf)
        m.scalar("FSA.gamma", 0.1)
    n_up = _n_up(scale)
    stride = 5 if n_up >= 2 else 6
    cin = nf
    for u in range(n_up):
        m.conv(f"upsample.{stride * u + 1}", unf, cin)
        m.conv(f"upsample.{stride * u + 2}.conv", unf, unf, k=1)
        m.conv(f"upsample.{stride * u + 4}", unf, unf)
        cin = unf
    m.conv("conv_last", out_nc, unf if n_up else nf)
    return m.state


def unet_state(num_downs=8, ngf=64, input_nc=3, output_nc=3,
               norm="batch", seed=0) -> StateDict:
    m = _Maker(seed)
    use_bias = norm == "instance"
    outer = [input_nc, ngf, ngf * 2, ngf * 4] + [ngf * 8] * (num_downs - 4)
    inner = [ngf, ngf * 2, ngf * 4, ngf * 8] + [ngf * 8] * (num_downs - 4)
    pre = "model.model"
    for l in range(num_downs):
        innermost = l == num_downs - 1
        if l == 0:
            m.conv(f"{pre}.0", inner[l], outer[l], k=4, bias=use_bias)
            m.deconv(f"{pre}.3", inner[l] * 2, output_nc, k=4, bias=True)
        elif innermost:
            m.conv(f"{pre}.1", inner[l], outer[l], k=4, bias=use_bias)
            m.deconv(f"{pre}.3", inner[l], outer[l], k=4, bias=use_bias)
            if norm == "batch":
                m.norm_affine(f"{pre}.4", outer[l])
        else:
            m.conv(f"{pre}.1", inner[l], outer[l], k=4, bias=use_bias)
            m.deconv(f"{pre}.5", inner[l] * 2, outer[l], k=4, bias=use_bias)
            if norm == "batch":
                m.norm_affine(f"{pre}.2", inner[l])
                m.norm_affine(f"{pre}.6", outer[l])
        pre = pre + (".1.model" if l == 0 else ".3.model")
    return m.state


def cyclegan_state(n_blocks=9, ngf=64, input_nc=3, output_nc=3, seed=0) -> StateDict:
    """Instance-norm variant (no norm params)."""
    m = _Maker(seed)
    m.conv("model.1", ngf, input_nc, k=7)
    m.conv("model.4", ngf * 2, ngf)
    m.conv("model.7", ngf * 4, ngf * 2)
    for i in range(n_blocks):
        m.conv(f"model.{10 + i}.conv_block.1", ngf * 4, ngf * 4)
        m.conv(f"model.{10 + i}.conv_block.5", ngf * 4, ngf * 4)
    m.deconv(f"model.{10 + n_blocks}", ngf * 4, ngf * 2, k=3)
    m.deconv(f"model.{13 + n_blocks}", ngf * 2, ngf, k=3)
    m.conv(f"model.{17 + n_blocks}", output_nc, ngf, k=7)
    return m.state


def wbc_state(nf=32, seed=0) -> StateDict:
    m = _Maker(seed)
    m.conv("conv", nf, 3, k=7)
    m.conv("conv_1", nf, nf)
    m.conv("conv_2", nf * 2, nf)
    m.conv("conv_3", nf * 2, nf * 2)
    m.conv("conv_4", nf * 4, nf * 2)
    for i in range(4):
        m.conv(f"block_{i}.conv1", nf * 4, nf * 4)
        m.conv(f"block_{i}.conv2", nf * 4, nf * 4)
    m.conv("conv_5", nf * 2, nf * 4)
    m.conv("conv_6", nf * 2, nf * 2)
    m.conv("conv_7", nf, nf * 2)
    m.conv("conv_8", nf, nf)
    m.conv("conv_9", 3, nf, k=7)
    return m.state


def build(family: str, *, scale: int = 4, dtype=None, seed: int = 0,
          **kw):
    """(ModelDef, params) for a random-init model of the given family."""
    import jax.numpy as jnp

    from innfer_tpu.config.defaults import get_network_config
    from innfer_tpu.loader import load_model_from_state

    dtype = dtype or jnp.float32
    if family == "esrgan":
        state = esrgan_state(scale=scale, seed=seed, **kw)
        cfg = get_network_config({"type": "esrgan", **kw}, scale)
    elif family == "srresnet":
        state = srresnet_state(scale=scale, seed=seed, **kw)
        cfg = get_network_config({"type": "srgan", **kw}, scale)
    elif family == "ppon":
        state = ppon_state(scale=scale, seed=seed, **kw)
        cfg = get_network_config({"type": "ppon", **kw}, scale)
    elif family == "pan":
        state = pan_state(scale=scale, seed=seed, **kw)
        cfg = get_network_config({"type": "pan", **kw}, scale)
    elif family == "unet":
        state = unet_state(seed=seed, **kw)
        cfg = get_network_config({"type": "unet_256", **{k: v for k, v in kw.items() if k != "norm"}}, 1)
    elif family == "cyclegan":
        state = cyclegan_state(seed=seed, **kw)
        cfg = get_network_config({"type": "resnet_9blocks", **kw}, 1)
    elif family == "wbc":
        state = wbc_state(seed=seed, **kw)
        cfg = get_network_config({"type": "wbcunet", **kw}, 1)
    else:
        raise ValueError(f"unknown family {family}")
    return load_model_from_state(state, cfg, param_dtype=dtype)


def esrgan_model_and_params(nb: int = 23, nf: int = 64, scale: int = 4,
                            dtype=None, seed: int = 0):
    """(ModelDef, params) for a random-init ESRGAN at full production size."""
    return build("esrgan", scale=scale, dtype=dtype, seed=seed, nb=nb, nf=nf)
