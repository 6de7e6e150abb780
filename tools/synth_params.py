"""Synthetic (random-init) parameter dicts for benchmarks and dry-runs.

Generates our-format params (NHWC/HWIO jnp arrays, torch key names) for any
config WITHOUT needing a checkpoint file — shapes follow the architecture
definitions exactly, so compiled graphs match real-checkpoint runs.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import numpy as np


def esrgan_state(nb: int = 23, nf: int = 64, gc: int = 32, in_nc: int = 3,
                 out_nc: int = 3, scale: int = 4, plus: bool = False,
                 seed: int = 0) -> Dict[str, np.ndarray]:
    """Flattened-layout ESRGAN state dict (torch OIHW shapes) with random
    weights at the correct fan-in scaling (so bf16 activations stay sane)."""
    rng = np.random.default_rng(seed)

    def w(o, i, k=3):
        std = 1.0 / math.sqrt(i * k * k)
        return rng.uniform(-std, std, size=(o, i, k, k)).astype(np.float32)

    def b(o):
        return rng.uniform(-0.01, 0.01, size=(o,)).astype(np.float32)

    state: Dict[str, np.ndarray] = {}
    state["model.0.weight"], state["model.0.bias"] = w(nf, in_nc), b(nf)
    for i in range(nb):
        for j in (1, 2, 3):
            p = f"model.1.sub.{i}.RDB{j}"
            for c in range(1, 6):
                cin = nf + (c - 1) * gc
                cout = gc if c < 5 else nf
                state[f"{p}.conv{c}.0.weight"] = w(cout, cin)
                state[f"{p}.conv{c}.0.bias"] = b(cout)
            if plus:
                state[f"{p}.conv1x1.weight"] = w(gc, nf, 1)
    state[f"model.1.sub.{nb}.weight"], state[f"model.1.sub.{nb}.bias"] = w(nf, nf), b(nf)

    n_up = int(math.log2(scale)) if scale not in (1, 3) else (1 if scale == 3 else 0)
    idx = 2
    for _ in range(n_up):
        state[f"model.{idx + 1}.weight"], state[f"model.{idx + 1}.bias"] = w(nf, nf), b(nf)
        idx += 3
    state[f"model.{idx}.weight"], state[f"model.{idx}.bias"] = w(nf, nf), b(nf)
    state[f"model.{idx + 2}.weight"], state[f"model.{idx + 2}.bias"] = w(out_nc, nf), b(out_nc)
    return state


def esrgan_model_and_params(nb: int = 23, nf: int = 64, scale: int = 4,
                            dtype=None, seed: int = 0):
    """(ModelDef, params) for a random-init ESRGAN at full production size."""
    import jax.numpy as jnp

    from innfer_tpu.config.defaults import get_network_config
    from innfer_tpu.loader import load_model_from_state

    state = esrgan_state(nb=nb, nf=nf, scale=scale, seed=seed)
    cfg = get_network_config({"type": "esrgan", "nb": nb, "nf": nf}, scale)
    return load_model_from_state(state, cfg,
                                 param_dtype=dtype or jnp.float32)
