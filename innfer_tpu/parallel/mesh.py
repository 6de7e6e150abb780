"""Device-mesh helpers: tile-level data parallelism + channel tensor parallelism.

The reference is strictly single-device (SURVEY.md §2.5); these are the
TPU-native scale-out components designed in its place:

  * data axis  — the overlap-tile batch is sharded across chips (each chip
    runs whole tiles; embarrassingly parallel over ICI, no collectives in
    the hot loop beyond the initial scatter / final gather),
  * model axis — output channels of the large conv weights are sharded
    (XLA inserts the all-gathers/reduce-scatters as needed), useful for
    very wide models or very large tiles.

Works identically on a real pod slice and on the virtual-N-device CPU mesh
used by tests and the driver dry-run.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use < 1 or use > len(devices):
        raise ValueError(
            f"mesh needs data*model = {n_data}*{n_model} = {use} devices, "
            f"but only {len(devices)} are available "
            f"(platform {devices[0].platform if devices else '?'}); for a "
            "virtual test mesh set XLA_FLAGS="
            "--xla_force_host_platform_device_count=N with JAX_PLATFORMS=cpu")
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def replicate_params(params: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place all params replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return {k: jax.device_put(v, sharding) for k, v in params.items()}


def tp_shard_params(params: Dict[str, jax.Array], mesh: Mesh,
                    axis: str = "model") -> Dict[str, jax.Array]:
    """Tensor-parallel placement: shard conv weights on the output-channel
    dim (HWIO's O) when divisible by the axis size; replicate the rest."""
    size = mesh.shape[axis]
    out = {}
    for k, v in params.items():
        if v.ndim == 4 and v.shape[-1] % size == 0 and v.shape[-1] >= size:
            spec = P(None, None, None, axis)
        elif v.ndim == 1 and v.shape[0] % size == 0 and v.shape[0] >= size:
            spec = P(axis)
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
