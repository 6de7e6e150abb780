"""TorchScript compatibility stage: host torch-CPU execution.

Reference parity target: `-a ts` loads a ``.pt`` archive with
``torch.jit.load`` and runs it through the same whole/chop pipeline
(reference run.py:40-42,193-195,204-209).  TorchScript archives embed
torch bytecode — there is nothing to compile for TPU — so this stage
executes them with the host's torch build (CPU, lazy optional import)
while keeping everything around the forward TPU-native: device pre/post
conversion, static tile plans, the seam-blend recompose, chaining, and
the guided filter all run exactly as for JAX stages.

Differences from the reference, both deliberate:
  * fp32 host execution (the reference also forces fp16 OFF for
    torchscript, run.py:341-343).
  * the model's scale is PROBED with a tiny forward at load time instead
    of trusted from the filename — the recompose needs the true scale,
    and a ``4x_``-named 2x model would silently corrupt output geometry.
"""
from __future__ import annotations

import zipfile
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from innfer_tpu.models.base import ModelDef


def is_torchscript(path: str) -> bool:
    """A TorchScript archive is a zip containing code + constants.pkl
    (same fingerprint checkpoint/torch_pickle.py uses to reject them)."""
    try:
        with zipfile.ZipFile(path) as z:
            return any(n.endswith("constants.pkl") for n in z.namelist())
    except (zipfile.BadZipFile, OSError):
        return False


def _load_torch(path: str):
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is in the image
        raise ImportError(
            "TorchScript checkpoints need the optional host `torch` "
            "package (CPU build is enough); state-dict .pth checkpoints "
            "run torch-free") from e
    mod = torch.jit.load(path, map_location="cpu")
    mod.eval()
    return torch, mod


class TorchScriptStage:
    """Pipeline stage executing a TorchScript module on the host CPU.

    Duck-types pipeline.Stage: ``__call__(x, force_whole=False)`` over
    (N, H, W, C) device arrays, plus ``.model`` (a ModelDef carrying the
    probed scale) and ``.chop``.
    """

    def __init__(self, path: str, *, scale: Optional[int] = None,
                 chop: bool = True, tile: int = 256, overlap: int = 16,
                 tile_batch: int = 8):
        self._torch, self._mod = _load_torch(path)
        self.chop = chop
        self.tile, self.overlap, self.tile_batch = tile, overlap, tile_batch
        probed = self._probe_scale()
        if scale and probed and scale != probed:
            print(f"Warning: filename/flag scale {scale} != probed scale "
                  f"{probed} for {path}; using {probed}")
        if probed is None:
            # every probe size failed (e.g. in_nc != 3 rejects the RGB
            # zeros input) — the very corruption probing exists to prevent
            # is now possible, and _forward_np will also assume 3-channel
            # NHWC at runtime, so be loud about the unverified fallback
            import warnings

            warnings.warn(
                f"TorchScript scale probe failed for {path} (no probe size "
                "accepted a 1x3xSxS input); falling back to the unverified "
                f"filename/flag scale {scale or 1}.  If the module expects "
                "non-3-channel input it cannot run in this pipeline; if its "
                "true scale differs, the tiled recompose geometry will be "
                "wrong.")
        self.model = ModelDef(
            name="torchscript", cfg={"type": "torchscript"},
            apply=None, scale=probed or scale or 1)
        self.params = None
        self.runner = None

    def _probe_scale(self) -> Optional[int]:
        """Run tiny forwards until one succeeds; scale = out_h / in_h.
        Fixed-topology nets (UNet-style) reject small inputs, so walk up."""
        for size in (64, 128, 256):
            try:
                with self._torch.no_grad():
                    out = self._mod(self._torch.zeros(1, 3, size, size))
                if isinstance(out, (tuple, list)):
                    raise ValueError(
                        "multi-output TorchScript modules are not supported "
                        "(the reference's ts path cannot run them either: "
                        "run.py:191-192 only indexes for arch 'ppon')")
                s, rem = divmod(int(out.shape[-1]), size)
                if rem == 0 and s >= 1:
                    return s
            except (RuntimeError, ValueError) as e:
                if isinstance(e, ValueError):
                    raise
                continue
        return None

    def _forward_np(self, x_nhwc: np.ndarray) -> np.ndarray:
        t = self._torch.from_numpy(
            np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
        with self._torch.no_grad():
            out = self._mod(t)
        if isinstance(out, (tuple, list)):
            raise ValueError("multi-output TorchScript modules are not supported")
        return np.ascontiguousarray(
            out.numpy().transpose(0, 2, 3, 1), dtype=np.float32)

    def __call__(self, x, *, force_whole: bool = False):
        x32 = np.asarray(x.astype(jnp.float32))
        if not self.chop or force_whole:
            return jnp.asarray(self._forward_np(x32))
        from innfer_tpu.tiling.engine import (extract_tiles, pad_image,
                                              recompose_tiles)
        from innfer_tpu.tiling.plan import make_uniform_plan

        outs: List[jnp.ndarray] = []
        for i in range(x32.shape[0]):
            img = jnp.asarray(x32[i:i + 1])
            h, w = int(img.shape[1]), int(img.shape[2])
            tile = min(self.tile, h, w)
            overlap = min(self.overlap, tile - 1)
            plan = make_uniform_plan(h, w, self.model.scale,
                                     tile=tile, overlap=overlap)
            tiles = np.asarray(extract_tiles(pad_image(img, plan), plan))
            sr = np.concatenate([
                self._forward_np(tiles[j:j + self.tile_batch])
                for j in range(0, tiles.shape[0], self.tile_batch)
            ])
            outs.append(recompose_tiles(jnp.asarray(sr), plan))
        return jnp.concatenate(outs, axis=0)
