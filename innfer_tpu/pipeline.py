"""Inference pipeline: model chains, per-arch presets, device pre/post.

TPU-native equivalent of the reference driver logic (run.py:229-447):

  * model-chain parsing ('+'/'>' separators, exact path -> ./models ->
    case-insensitive substring search, scale from 'Nx_' filename prefix)
  * per-arch-family presets (pix2pix / cyclegan / default extras:
    eval-mode, strict loading, [-1,1] normalization, chop, resize,
    guided filter, modcrop; run.py:299-379)
  * device-side np<->tensor conversion fused into the graph (dtype-aware
    range scaling, BGR<->RGB, optional [-1,1] norm; utils.py:164-248)
  * per-stage execution: tiled (TiledRunner) or whole-image jit, chained.

bfloat16 replaces the reference's fp16 default (run.py:382-383); fp32
accumulation is preserved inside every conv (innfer_tpu.nn.functional).
"""
from __future__ import annotations

import os
import os.path as osp
import threading
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from innfer_tpu.io import images as iio
from innfer_tpu.loader import load_model
from innfer_tpu.models.base import ModelDef, Params
from innfer_tpu.ops import colors
from innfer_tpu.ops.filters import color_fix, guided_filter
from innfer_tpu.tiling.engine import TiledRunner

import contextlib


def _nullctx():
    return contextlib.nullcontext()


def _find_reference(metrics_dir: str, name: str) -> Optional[np.ndarray]:
    for ext in (".png", ".jpg", ".jpeg", ".bmp", ".webp"):
        p = osp.join(metrics_dir, name + ext)
        if osp.isfile(p):
            return iio.read_img(p)
    return None


# ---------------------------------------------------------------------------
# Presets (reference run.py:299-315)
# ---------------------------------------------------------------------------

PIX2PIX_EXTRAS = dict(meval=False, strict=True, normalize=True)
CYCLEGAN_EXTRAS = dict(meval=True, strict=False, normalize=True)
DEFAULT_EXTRAS = dict(meval=True, strict=True, normalize=False)


@dataclass
class Presets:
    meval: bool = True
    strict: bool = True
    normalize: bool = False
    chop: bool = True
    resize: int = 0           # linear_resize target (unet/p2p families)
    use_guided_filter: bool = False
    use_modcrop: bool = False
    arch: str = "infer"
    family: str = "default"   # pix2pix | cyclegan | wbc | default


def _has_tf_token(s: str) -> bool:
    """True when 'tf' appears as a delimited token ('wbc_tf', 'tf-cartoon',
    '4x.tf.pth') rather than as letters inside a word ('artframe')."""
    import re

    return bool(re.search(r"(?:^|[^0-9a-zA-Z])tf(?:[^0-9a-zA-Z]|$)", s))


def select_presets(arch: str, models_arg: str = "", norm_flag: bool = False) -> Presets:
    """Arch-family preset selection (run.py:347-379)."""
    p = Presets(arch=arch)
    # 'and not wbc': 'unet_' is a substring of 'wbcunet_tf', so an explicit
    # -a wbcunet_tf would otherwise route to the pix2pix branch — dropping
    # the guided filter + modcrop wbc outputs depend on (the reference
    # never hits this: its wbc sniff keys on the models string)
    if ("unet_" in arch or "p2p_" in arch) and "wbc" not in arch:
        p.meval, p.strict, p.normalize = (
            PIX2PIX_EXTRAS["meval"], PIX2PIX_EXTRAS["strict"], PIX2PIX_EXTRAS["normalize"])
        p.chop = False
        p.family = "pix2pix"
        for size in (512, 256, 128):
            if str(size) in arch:
                p.resize = size
                break
        else:
            p.resize = 256
    elif "resnet_" in arch or "cg_" in arch:
        p.meval, p.strict, p.normalize = (
            CYCLEGAN_EXTRAS["meval"], CYCLEGAN_EXTRAS["strict"], CYCLEGAN_EXTRAS["normalize"])
        p.chop = True
        p.family = "cyclegan"
    elif "wbc" in arch or "wbc" in models_arg:
        # the reference sniffs a bare substring ("tf" in models_arg,
        # run.py:362-371), which false-positives on any model name merely
        # containing the letters (e.g. "artframe.pth").  Match tf only as
        # a delimited token of the arch or model names.
        p.arch = "wbcunet_tf" if (_has_tf_token(arch) or _has_tf_token(models_arg)) else "wbcunet"
        p.meval, p.strict, p.normalize = (
            PIX2PIX_EXTRAS["meval"], PIX2PIX_EXTRAS["strict"], PIX2PIX_EXTRAS["normalize"])
        p.chop = False
        p.use_guided_filter = True
        p.use_modcrop = True
        p.family = "wbc"
    if norm_flag:
        p.normalize = True
    return p


# ---------------------------------------------------------------------------
# Model-chain resolution (run.py:229-293)
# ---------------------------------------------------------------------------

def check_model_path(model_path: str, all_models: Optional[Sequence[str]] = None,
                     models_dir: str = "./models") -> str:
    if osp.isfile(model_path):
        return model_path
    alt = osp.join(models_dir, model_path)
    if osp.isfile(alt):
        return alt
    if all_models:
        matches = [m for m in all_models if model_path.lower() in str(m).lower()]
        if len(matches) > 1:
            raise ValueError(f"Filter {model_path} returned multiple models: {matches}.")
        if matches:
            return matches[0]
    raise ValueError(f"Model {model_path} not found.")


def get_scale_name(model_path: str, scale: Optional[int] = None) -> Optional[int]:
    """Scale from the 'Nx'/'xN' two-char filename prefix (run.py:278-293)."""
    prefix = str(osp.basename(model_path)[0:2]).lower()
    rlt = None
    if "x" in prefix:
        try:
            rlt = int(prefix.replace("x", ""))
        except ValueError:
            rlt = None
    if scale:
        if rlt and scale != rlt:
            print(f"Warning: possible model scale mismatch on {model_path}")
        return scale
    return rlt


def parse_models(models_arg: str, scales: Optional[List[Optional[int]]] = None,
                 models_dir: str = "./models") -> Tuple[List[str], List[Optional[int]]]:
    chain = models_arg.split("+") if "+" in models_arg else models_arg.split(">")
    try:
        all_models = iio.get_models_paths(models_dir)
    except AssertionError:
        all_models = None
    paths = [check_model_path(m, all_models, models_dir) for m in chain]
    if scales is None:
        scales = [get_scale_name(p) for p in paths]
    elif len(scales) != len(paths):
        raise ValueError(
            f"The num. of scales {len(scales)} is != from number of models {len(paths)}")
    return paths, scales


# ---------------------------------------------------------------------------
# Device pre/post conversion (utils.py:164-248, fused on device)
# ---------------------------------------------------------------------------

def np2tensor(img: np.ndarray, *, normalize: bool = False, dtype=jnp.float32) -> jax.Array:
    """HWC BGR uint8/uint16 numpy -> (1, H, W, C) RGB float device array.

    A 4-D (N, H, W, C) input is treated as an already-stacked batch of
    same-shape images (batched directory mode) and converted as one array.
    """
    if not isinstance(img, np.ndarray):
        raise TypeError("Got unexpected object type, expected np.ndarray")
    batched = img.ndim == 4
    if img.ndim == 2:
        img = img[:, :, None]
    maxval = iio.MAX_VALUES_BY_DTYPE.get(img.dtype, 1.0)
    # upload in the SOURCE dtype (uint8/uint16) and scale on device: the
    # tunneled host<->device link is the product loop's bottleneck
    # (bench e2e stage attribution), and a host-side float32 conversion
    # would quadruple the upload bytes
    x = jnp.asarray(img).astype(jnp.float32) / maxval
    c = x.shape[-1]
    if c % 3 == 0:
        x = colors.bgr_to_rgb(x)
    elif c == 4:
        x = colors.bgra_to_rgba(x)
    if normalize:
        x = colors.norm(x)
    return (x if batched else x[None]).astype(dtype)


# device->host transfers below this size aren't worth splitting (stream
# setup overhead dominates); above it, parallel row-band streams lift the
# tunneled link's throughput — the gain is WINDOW-dependent (~15-17 MB/s
# one stream vs ~20-24 at 8-16 streams in a weak window; an earlier
# healthier window measured ~35-40 multiway) and never negative
# (tools/link_probe.py / tools/out/link_probe.json)
_FETCH_SPLIT_BYTES = 32 * 1024 ** 2
_fetch_pool = None
_fetch_pool_lock = threading.Lock()


def fetch_np(x) -> np.ndarray:
    """Device->host transfer, chunked into parallel band streams.

    Large arrays (full SR outputs: a 4x-upscaled 1080p frame is ~100 MB
    even as uint8) are split along axis 0 into INNFER_FETCH_WAYS bands
    (default 8, 1 = plain ``np.asarray``) fetched on a shared thread
    pool; concurrent _finalize fetches share the same pool so the link
    sees a bounded stream count.  Small arrays pass straight through.
    Band math lives in DeviceBands — this is the fetch-now spelling.
    """
    if isinstance(x, np.ndarray):
        return x
    if x.ndim == 0:
        return np.asarray(x)
    return DeviceBands(x).fetch()


def _get_fetch_pool():
    global _fetch_pool
    with _fetch_pool_lock:
        if _fetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            _fetch_pool = ThreadPoolExecutor(
                max_workers=int(os.environ.get("INNFER_FETCH_WAYS", "8")),
                thread_name_prefix="innfer-fetch")
    return _fetch_pool


def _postprocess_u8(x: jax.Array, *, denormalize: bool = False,
                    batched: bool = False) -> jax.Array:
    """Device-side half of tensor2np: RGB float -> BGR uint8, no fetch.

    Rounds/clips AND casts to uint8 on device: fetching float32 would
    move 4x the bytes over the (bottleneck) tunneled link — 400 MB vs
    100 MB for one 4x-upscaled 1080p output.
    """
    x = x.astype(jnp.float32) if batched else x[0].astype(jnp.float32)
    c = x.shape[-1]
    if c == 3:
        x = colors.rgb_to_bgr(x)
    elif c == 4:
        x = colors.rgba_to_bgra(x)
    if denormalize:
        x = colors.denorm(x)
    return jnp.round(jnp.clip(255.0 * x, 0, 255)).astype(jnp.uint8)


def tensor2np(x: jax.Array, *, denormalize: bool = False,
              batched: bool = False) -> np.ndarray:
    """(1, H, W, C) RGB float -> HWC BGR uint8 numpy (utils.py:197-248).

    ``batched=True`` keeps the leading batch axis: (N,H,W,C) -> (N,H,W,C).
    """
    return fetch_np(_postprocess_u8(x, denormalize=denormalize,
                                    batched=batched))


class DeviceBands:
    """A postprocessed uint8 output, pre-sliced into fetch bands at
    DISPATCH time.

    The product loop hands finished outputs to a background pool for the
    (tunnel-expensive) device->host transfer.  If the pool thread also
    dispatched the u8 cast / band slices, those device ops would queue
    BEHIND every later image's forwards already dispatched by the main
    loop — each fetch then stalls on unrelated compute (measured: the
    e2e fetch stage ran ~3x slower than the link probe's stream rate).
    Slicing here, on the main loop right after the forward, keeps device
    order aligned with consumption order; ``fetch()`` is pure transfer.
    """

    def __init__(self, x_u8: jax.Array):
        ways = int(os.environ.get("INNFER_FETCH_WAYS", "8"))
        nbytes = x_u8.size * x_u8.dtype.itemsize
        if ways <= 1 or nbytes < _FETCH_SPLIT_BYTES:
            self.bands = [x_u8]
            self.band_h = x_u8.shape[0]
        else:
            ways = min(ways, x_u8.shape[0])
            self.band_h = -(-x_u8.shape[0] // ways)
            self.bands = [x_u8[i * self.band_h:(i + 1) * self.band_h]
                          for i in range(ways)
                          if i * self.band_h < x_u8.shape[0]]
        self.shape, self.dtype = x_u8.shape, x_u8.dtype

    def fetch(self) -> np.ndarray:
        if len(self.bands) == 1:
            return np.asarray(self.bands[0])
        pool = _get_fetch_pool()
        out = np.empty(self.shape, self.dtype)
        for i, part in enumerate(pool.map(np.asarray, self.bands)):
            out[i * self.band_h:i * self.band_h + part.shape[0]] = part
        return out


# ---------------------------------------------------------------------------
# Per-stage execution
# ---------------------------------------------------------------------------

# conservative per-stage activation budget for whole-image forwards; the
# v5e has 16 GB HBM, leave headroom for params/output/XLA workspace
_WHOLE_IMAGE_HBM_BUDGET = 8 * 1024 ** 3


def _whole_forward_bytes(model: ModelDef, x_shape: Sequence[int]) -> int:
    """Per-architecture peak-activation estimate for an untiled forward
    of an (N, H, W, C) input shape.

    SR families are dominated by the upsample tail (a few nf-wide fp32
    maps at output resolution, e.g. SRResNet pixelshuffle at 4320p;
    bench.py srresnet notes) plus the dense-concat live width at LR.
    Image-to-image families (scale 1) peak at input resolution: UNet's
    ngf*8 bottleneck sits at 1/64 spatial so the outermost skip concat
    (2*ngf at full res) dominates instead; CycleGAN holds ngf maps at
    full res plus reflect-pad copies."""
    px = x_shape[0] * x_shape[1] * x_shape[2]
    cfg = model.cfg
    kind = str(cfg.get("type", ""))
    nf = int(cfg.get("nf", cfg.get("ngf", 64)))
    if kind == "unet_net":
        ngf = int(cfg.get("ngf", 64))
        # outermost up: concat(down0 skip, up1 out) = 2*ngf at full res,
        # ~3 such maps live (deconv input, concat, conv workspace)
        return px * ngf * 2 * 4 * 3
    if kind == "resnet_net":
        ngf = int(cfg.get("ngf", 64))
        return px * ngf * 4 * 4
    if kind == "wbcunet_net":
        return px * nf * 4 * 4
    gc = int(cfg.get("gc", 0) or 0)
    lr_width = nf + 4 * gc if gc else nf
    return px * lr_width * 4 * 2 + px * model.scale ** 2 * nf * 4 * 3


@dataclass
class Stage:
    """One model in the chain plus its compiled runner."""

    model: ModelDef
    params: Params
    chop: bool
    runner: Optional[TiledRunner] = None
    mesh: Any = None
    _whole_jit: Any = None
    _fallback: Optional[TiledRunner] = None

    def __call__(self, x: jax.Array, *, force_whole: bool = False) -> jax.Array:
        """``force_whole=True`` bypasses the tiled runner (batched directory
        mode runs stacked same-shape images whole-image; the caller is
        responsible for the HBM budget precheck — see run_batch)."""
        if self.chop and self.runner is not None and not force_whole:
            return self.runner(self.params, x)
        if (not force_whole and jax.default_backend() != "cpu"
                and _whole_forward_bytes(self.model, x.shape) > _WHOLE_IMAGE_HBM_BUDGET):
            # whole-image activations would overflow HBM: fall back to the
            # auto-tiled engine instead of crashing the device.  Stages
            # whose numerics DEPEND on whole-image extent (train-mode batch
            # norm computes batch statistics) must not silently switch to
            # per-tile statistics — fail loudly instead.
            has_stat_norm = self.model.cfg.get("norm_type") not in (None, "none")
            if not self.model.cfg.get("meval", True) and has_stat_norm:
                raise ValueError(
                    f"whole-image forward of {x.shape[1]}x{x.shape[2]} would "
                    f"need ~{_whole_forward_bytes(self.model, x.shape) / 1024**3:.1f}"
                    " GB HBM, and this stage runs train-mode normalization "
                    "whose statistics are whole-image-dependent — tiled "
                    "execution would change the output.  Resize the input "
                    "(the reference resizes pix2pix inputs to 256/512) or "
                    "run on a host with more memory.")
            if self._fallback is None:
                import logging

                logging.getLogger("innfer_tpu").warning(
                    "whole-image forward of %dx%d would need ~%.1f GB HBM; "
                    "falling back to tiled execution",
                    x.shape[1], x.shape[2],
                    _whole_forward_bytes(self.model, x.shape) / 1024 ** 3)
                self._fallback = TiledRunner(
                    self.model.apply, self.model.scale, mode="auto",
                    output_index=self.model.output_index,
                    tile_quantum=self.model.tile_quantum,
                    tile_quantum_strict=self.model.tile_quantum_strict,
                    mesh=self.mesh,
                    compute_dtype=x.dtype)
            return self._fallback(self.params, x)
        if self._whole_jit is None:
            def fwd(params, data):
                out = self.model.apply(params, data)
                if self.model.output_index is not None:
                    out = out[self.model.output_index]
                return out
            self._whole_jit = jax.jit(fwd)
        return self._whole_jit(self.params, x)


class InferenceSession:
    """A loaded model chain ready to process images.

    The TPU replacement for the reference's per-image main loop
    (run.py:404-442): chained stages, optional guided filter between wbc
    stages, color-fix post, comparison output.
    """

    def __init__(
        self,
        models_arg: str,
        *,
        arch: str = "infer",
        models_dir: str = "./models",
        presets: Optional[Presets] = None,
        compute_dtype=jnp.bfloat16,
        tile: int = 256,
        overlap: int = 16,
        tile_mode: str = "uniform",
        tile_batch: int = 8,
        bucket: int = 0,
        mesh=None,
        scale: Optional[int] = None,
        spatial: bool = False,
        fused_chain: Optional[bool] = None,
    ):
        self.presets = presets or select_presets(arch, models_arg)
        self.compute_dtype = compute_dtype
        # -s applies to a SINGLE model only, like the reference
        # (run.py:391-394 never passes -s into chain parsing): broadcasting
        # one scale over a mixed chain ("1x_a.pth+4x_b.pth" -s 4) would
        # build the 1x stage as a 4x net and fail conversion.  Chains
        # always take per-stage scales from the filenames.
        paths, scales = parse_models(models_arg, None, models_dir)
        if scale is not None:
            if len(paths) == 1:
                scales = [scale]
            elif any(s != scale for s in scales):
                import logging

                logging.getLogger("innfer_tpu").warning(
                    "-s %d ignored for the %d-model chain (per-stage scales"
                    " %s come from the filenames, like the reference)",
                    scale, len(paths), scales)
        self._mesh = mesh
        self._spatial = spatial
        if mesh is not None:
            # dp requires whole chunks per device; round the tile batch up
            n_data = mesh.shape.get("data", 1)
            tile_batch = -(-tile_batch // n_data) * n_data
        self.stages: List[Stage] = []
        for path, sc in zip(paths, scales):
            from innfer_tpu.compat.torchscript import (TorchScriptStage,
                                                       is_torchscript)

            if self.presets.arch == "ts" or is_torchscript(path):
                # reference `-a ts` path (run.py:40-42): torch bytecode has
                # nothing to compile for TPU, so the forward runs on host
                # torch-CPU; tiling/recompose/chain/pre/post stay TPU-side
                if spatial:
                    raise NotImplementedError(
                        "--spatial cannot shard a host-executed TorchScript "
                        "module; remove --spatial")
                self.stages.append(TorchScriptStage(
                    path, scale=sc, chop=self.presets.chop, tile=tile,
                    overlap=overlap, tile_batch=tile_batch))
                continue
            model, params = load_model(
                path, arch=self.presets.arch, scale=sc,
                strict=self.presets.strict, param_dtype=compute_dtype,
            )
            if model.cfg.get("convtype") == "Conv3D":
                raise ValueError(
                    "evsrgan (Conv3D) is a video network with 5D NDHWC "
                    "inputs; the image pipeline cannot feed it (the "
                    "reference CLI cannot either) — use the library API "
                    "(innfer_tpu.loader + model.apply) instead")
            if mesh is not None:
                from innfer_tpu.parallel.mesh import (replicate_params,
                                                      tp_shard_params)

                if mesh.shape.get("model", 1) > 1:
                    params = tp_shard_params(params, mesh)
                else:
                    params = replicate_params(params, mesh)
            if not self.presets.meval:
                model.cfg["meval"] = False
                # rebuild with train-mode norm behavior (pix2pix BN)
                from innfer_tpu.models import get_network

                rebuilt = get_network(model.cfg)
                rebuilt.remap = model.remap
                model = rebuilt
            runner = None
            chop = self.presets.chop
            if spatial and mesh is not None:
                if mesh.shape.get("model", 1) > 1:
                    raise NotImplementedError(
                        "--spatial shards the image over the 'data' axis "
                        "only; combining it with --tp would silently "
                        "re-replicate the tp-sharded params inside "
                        "shard_map.  Use --spatial with --dp alone.")
                # intra-image spatial sharding: whole-image forward,
                # H-sharded over the mesh with per-conv halo exchange
                from innfer_tpu.parallel.spatial_model import (
                    SpatialRunner, spatial_rejection_reason,
                    spatial_supported)

                if not spatial_supported(model.cfg):
                    raise NotImplementedError(
                        "--spatial: " + spatial_rejection_reason(model.cfg))
                runner = SpatialRunner(model, mesh)
                chop = True  # route Stage through the runner
            elif chop:
                stage_mode = tile_mode
                if tile_mode == "hybrid" and model.apply_trunk is None:
                    raise ValueError(
                        "--tile-mode hybrid requires an architecture with a "
                        f"trunk/tail split; {model.cfg.get('type')} does not "
                        "expose one (use auto/uniform)")
                runner = TiledRunner(
                    model.apply, model.scale, mode=stage_mode, tile=tile,
                    overlap=overlap, tile_batch=tile_batch, bucket=bucket,
                    output_index=model.output_index, mesh=mesh,
                    compute_dtype=compute_dtype,
                    tile_quantum=model.tile_quantum,
                    tile_quantum_strict=model.tile_quantum_strict,
                    trunk_fn=model.apply_trunk, tail_fn=model.apply_tail,
                    tail_halo=model.tail_halo,
                )
            self.stages.append(Stage(model, params, chop, runner, mesh=mesh))

        # Chains default to SEQUENTIAL stage-by-stage execution (the
        # reference semantics, run.py:425-429): measured same-window at
        # the product chain config, sequential 9.07 beats the best fused
        # tile-through-chain variant 7.51 MP/s (tools/out/
        # chain_product_ab.json, round 5) because each sequential stage
        # gets the hybrid whole-image-trunk upgrade the fused tile pass
        # cannot use — and sequential never loses on memory (the final
        # output always dominates the intermediate image it materializes).
        # The fused path (one tile pass runs every stage; intermediates
        # exist only at tile granularity) remains OPT-IN via
        # fused_chain=True / --fused-chain for floor-bound chains of
        # non-hybrid models.
        self._fused_runner = None
        has_ts = any(st.model.apply is None for st in self.stages)
        if fused_chain is None:
            fused_chain = False
        if fused_chain and len(self.stages) > 1:
            if self.presets.use_guided_filter:
                raise ValueError(
                    "fused_chain cannot apply the per-stage guided filter "
                    "(wbc preset); use fused_chain=False")
            if has_ts:
                raise ValueError(
                    "fused_chain cannot run host-executed TorchScript "
                    "stages inside the jitted tile pass; use "
                    "fused_chain=False (chains with a ts stage default "
                    "to the sequential path)")
            # cap the input tile so the final-scale tile stays bounded: a
            # 4x+4x chain at tile 256 would make 4096^2-pixel SR tiles
            fused_tile = min(tile, max(64, 1024 // max(self.total_scale, 1)))
            # border contamination grows with the chain's combined
            # receptive field, so scale the fused overlap with chain depth
            # (ADVICE r3) instead of capping at tile/4; tile/3 keeps the
            # stride positive and the waste bounded
            fused_overlap = min(overlap * len(self.stages), fused_tile // 3)
            self._fused_runner = self.build_fused_chain(
                tile=fused_tile, overlap=fused_overlap,
                tile_batch=tile_batch, mesh=mesh,
                # hybrid applies to single-model stages only; the fused
                # chain (multi-stage per tile) plans its grid with auto
                mode="auto" if tile_mode == "hybrid" else tile_mode,
            )

    @property
    def total_scale(self) -> int:
        s = 1
        for st in self.stages:
            s *= st.model.scale
        return s

    def build_fused_chain(self, *, tile: int = 128, overlap: int = 8,
                          tile_batch: int = 8, mesh=None,
                          mode: str = "uniform") -> TiledRunner:
        """Tile-through-chain execution: ONE tile pass runs every stage on
        each tile and blends once at the final scale.

        OPT-IN since round 5: the same-window product A/B
        (tools/out/chain_product_ab.json) measured sequential 9.07 MP/s vs
        fused 6.23 (default depth-scaled overlap 32) / 7.51 (overlap 16) —
        sequential stages ride the hybrid whole-image-trunk upgrade the
        fused tile pass cannot.  The depth-scaled overlap default is a
        parity bound (border contamination grows with the chain's combined
        receptive field, ADVICE r3); callers chasing speed can pass a
        smaller overlap and accept divergence near tile borders.

        Addresses the chain-memory hard part (SURVEY.md §7): a 4x+4x chain
        never materializes the 16x-pixel intermediate image — intermediates
        exist only at tile granularity in VMEM/HBM working space.  Seam
        blending happens once in the final output space (a quality-neutral
        variant of per-stage blending; seams remain inside the overlap).

        Note: per-stage guided filtering (the wbc preset) is not applied
        between fused stages — use the default per-stage path for wbc
        chains.
        """
        stages = self.stages

        def chained(params_ignored, t):
            for st in stages:
                out = st.model.apply(st.params, t)
                if st.model.output_index is not None:
                    out = out[st.model.output_index]
                t = out
            return t

        return TiledRunner(
            chained, self.total_scale, mode=mode, tile=tile,
            overlap=overlap, tile_batch=tile_batch, mesh=mesh,
            compute_dtype=self.compute_dtype,
            tile_quantum=max(st.model.tile_quantum for st in stages),
            tile_quantum_strict=any(
                st.model.tile_quantum_strict for st in stages),
        )

    def prepare(self, img: np.ndarray) -> np.ndarray:
        if self.presets.resize:
            img = iio.linear_resize(img, self.presets.resize)
        if self.presets.use_modcrop:
            img = iio.modcrop(img, 4)
        return img

    def run_image(self, img: np.ndarray, *, already_prepared: bool = False,
                  device_out: bool = False, color_ref: Optional[np.ndarray] = None):
        """Full per-image pipeline: prepare -> chain -> uint8 BGR out.

        ``device_out=True`` returns a DeviceBands — the postprocessed u8
        output pre-sliced into fetch bands at dispatch time — WITHOUT the
        device->host fetch: process() hands the transfer to the
        background encode pool so it overlaps the next image's device
        compute, while the postprocess ops stay in dispatch order (see
        DeviceBands docstring).

        ``color_ref`` applies color_fix ON DEVICE against the given
        (prepared, host uint8 BGR) input image, before any fetch: the
        host-side spelling would fetch the ~100 MB SR output, re-upload
        it over the (bottleneck) tunneled link and dispatch from off the
        main loop — uploading the small pre-SR input instead is ~16x
        fewer transfer bytes at 4x scale and keeps dispatch order.
        """
        if not already_prepared:
            img = self.prepare(img)
        t_img = np2tensor(img, normalize=self.presets.normalize,
                          dtype=self.compute_dtype)
        if self._fused_runner is not None:
            t_out = self._fused_runner(None, t_img)
        else:
            t_out = t_img
            for stage in self.stages:
                t_out = stage(t_out)
                if self.presets.use_guided_filter:
                    t_out = guided_filter(t_img, t_out, r=1, eps=5e-3)
        u8 = _postprocess_u8(t_out, denormalize=self.presets.normalize)
        if color_ref is not None:
            u8 = color_fix(jnp.asarray(color_ref), u8)
        if device_out:
            return DeviceBands(u8)
        return fetch_np(u8)

    def batchable(self, shape: Sequence[int], n: int) -> bool:
        """Whether ``n`` stacked images of prepared HWC ``shape`` can run
        as one whole-image batched forward within the HBM budget.

        Batched mode runs every stage whole-image (stacked small inputs
        are exactly the regime where tiling's dispatch floor dominates);
        chop exists for memory, so the budget check — at every chained
        stage's intermediate resolution — is the real gate.  On CPU the
        budget is waived like Stage.__call__ does.
        """
        if n <= 1:
            return False
        h, w = int(shape[0]), int(shape[1])
        c = int(shape[2]) if len(shape) > 2 else 1
        if jax.default_backend() == "cpu":
            return True
        for st in self.stages:
            if _whole_forward_bytes(st.model, (n, h, w, c)) > _WHOLE_IMAGE_HBM_BUDGET:
                return False
            h, w = h * st.model.scale, w * st.model.scale
            c = int(st.model.cfg.get("out_nc", 3))
        return True

    def batchable_tiled(self, shape: Sequence[int], n: int) -> bool:
        """Whether ``n`` stacked images can run through the TILED engine
        (cross-image tile stacking).  Per-dispatch activations stay bounded
        by the engine's group-px cap regardless of ``n``; the ``n``-scaled
        cost is the resident canvases — input stack, fp32 SR tiles, fp32
        recompose canvas and output per image — estimated at ~24 bytes per
        output pixel with a 2 GB reserve for the group activations."""
        if n <= 1:
            return False
        if jax.default_backend() == "cpu":
            return True
        h, w = int(shape[0]), int(shape[1])
        out_px = n * h * w * self.total_scale ** 2
        return out_px * 24 < _WHOLE_IMAGE_HBM_BUDGET - 2 * 1024 ** 3

    def _group_fits(self, shape: Sequence[int], n: int) -> bool:
        # mirror run_batch's path order: whole-image stacking when it
        # fits, tiled stacking as the chop-preset mid-tier
        if self.batchable(shape, n):
            return True
        return self.presets.chop and self.batchable_tiled(shape, n)

    def auto_batch(self, shape: Sequence[int], cap: int = 0) -> int:
        """Estimator-driven group size for ``--batch 0`` (auto): the
        largest power-of-2 N <= cap whose stacked activations fit the HBM
        budget (VERDICT r4 #4 — the measured b32-vs-b8 gap left 3x on the
        table under the old constant 8).  The cap (default 32, env
        INNFER_MAX_BATCH) bounds group-fill latency and compile size; the
        known cg whole-image batch-4 compile pathology (BASELINE.md) is
        fenced in _fence_cg_batch."""
        cap = cap or int(os.environ.get("INNFER_MAX_BATCH", "32"))
        n = 1
        while n * 2 <= cap and self._group_fits(shape, n * 2):
            n *= 2
        return self._fence_cg_batch(n, explicit=False)

    def _fence_cg_batch(self, n: int, explicit: bool = True) -> int:
        """CycleGAN WHOLE-IMAGE forwards at exactly batch 4 compile ~4x
        slower, reproducibly (XLA shape pathology, BASELINE.md), and
        run_batch prefers the whole-image path whenever it fits HBM —
        so any cyclegan session at batch 4 can hit it.  Auto sizing never
        picks 4 for an affected session (bumps to 2); run_batch itself
        splits any whole-image batch-4 group 2+2 (identical outputs),
        which also fences never-full directory flushes whose NATURAL
        size lands on 4.  An explicit --batch 4 gets a heads-up that the
        groups will run split."""
        if n != 4:
            return n
        if not any(st.model.cfg.get("type") == "resnet_net"
                   for st in self.stages):
            return n
        import logging

        if explicit:
            logging.getLogger("innfer_tpu").warning(
                "cyclegan whole-image forwards at batch 4 hit a known "
                "~4x XLA compile stall on TPU (BASELINE.md); groups "
                "will run as two batch-2 forwards (identical outputs) — "
                "consider --batch 8 or --batch 2")
            return n
        return 2

    def run_batch(self, imgs: List[np.ndarray], *,
                  already_prepared: bool = False,
                  pad_to: Optional[int] = None,
                  use_color_fix: bool = False,
                  device_out: bool = False) -> List[Any]:
        """Run N same-shape images as ONE stacked forward.

        TPU-native addition (no reference analogue — the reference loop is
        strictly serial, run.py:404-442): small fixed-size inputs (pix2pix
        256/512, cyclegan slabs, wbc) are dispatch-floor-bound at batch 1,
        so stacking fills the MXU and amortizes per-op overhead.  Chopped
        presets (cyclegan, default SR) route the stack through the TILED
        engine — tiles from all images share dispatch groups grown toward
        the group-px cap (cross-image tile stacking, engine.tiled_apply);
        whole-image presets run one stacked untiled forward.  Exact
        per-image parity by construction: convs/instance-norm are
        batch-independent and train-mode batch norm reduces per image
        (nn/functional.batch_norm).  Falls back to the per-image path when
        shapes differ or the batched activations would overflow HBM.

        ``pad_to`` pads the stacked batch with copies of the last image
        (outputs dropped) so every flush of a shape bucket reuses ONE
        compiled shape; padding happens AFTER the batchability decision,
        so the per-image fallback never forwards the pad duplicates.
        ``device_out=True`` returns per-image DeviceBands (sliced at
        dispatch time) instead of fetched numpy, so process()'s encode
        pool overlaps the tunnel-bound transfer with the next group.
        """
        if not already_prepared:
            imgs = [self.prepare(im) for im in imgs]
        imgs = [im[:, :, None] if im.ndim == 2 else im for im in imgs]
        n_real = len(imgs)
        n_run = max(pad_to or n_real, n_real)
        same = all(im.shape == imgs[0].shape and im.dtype == imgs[0].dtype
                   for im in imgs)
        # Path order is measured, not aesthetic (tools/out/batch_ab.json,
        # tile_stack_ab.json): whole-image stacking wins whenever it fits
        # HBM (cg whole b8 38.4 vs tiled-b1 25.3 MP/s — the per-op floor
        # amortizes best with one big dispatch); tiled stacking is the
        # mid-tier for stacks whose whole-image activations don't fit;
        # per-image is the fallback.  Tiled stacking needs every stage on
        # the jit path: spatial runners shard ONE image and host-executed
        # TorchScript stages loop internally anyway, so both keep the
        # per-image path.
        has_ts = any(st.model.apply is None for st in self.stages)
        whole_ok = same and self.batchable(imgs[0].shape, n_run)
        if whole_ok and self._fused_runner is not None:
            # an explicit --fused-chain session must not silently
            # materialize every intermediate stage image for stacked
            # groups (the memory behavior the user opted out of), nor mix
            # exact whole-image outputs with tile-local fused ones in a
            # single directory run — keep every image on the fused
            # tile-through-chain path
            whole_ok = False
        tiled_ok = (not whole_ok and self.presets.chop and not self._spatial
                    and not has_ts
                    and same and self.batchable_tiled(imgs[0].shape, n_run))
        if not whole_ok and not tiled_ok:
            return [self.run_image(im, already_prepared=True,
                                   device_out=device_out,
                                   color_ref=im if use_color_fix else None)
                    for im in imgs]
        if (whole_ok and n_run == 4 and jax.default_backend() != "cpu"
                and any(st.model.cfg.get("type") == "resnet_net"
                        for st in self.stages)):
            # CycleGAN whole-image forwards at EXACTLY batch 4 hit a
            # reproducible ~4x XLA compile stall (BASELINE.md).  Split the
            # group 2+2 instead: identical outputs (convs/instance-norm
            # are batch-independent), never-full directory flushes of a
            # natural 4 are fenced the same as explicit --batch 4, and
            # both halves share ONE compiled batch-2 shape.
            out = []
            for part in (imgs[:2], imgs[2:]):
                if part:
                    out += self.run_batch(part, already_prepared=True,
                                          pad_to=2,
                                          use_color_fix=use_color_fix,
                                          device_out=device_out)
            return out
        stacked = np.stack(imgs + [imgs[-1]] * (n_run - n_real))
        t_img = np2tensor(stacked, normalize=self.presets.normalize,
                          dtype=self.compute_dtype)
        if (self._mesh is not None
                and self._mesh.shape.get("model", 1) == 1
                and t_img.shape[0] % self._mesh.shape.get("data", 1) == 0
                and not tiled_ok):
            # image-level dp: shard the stacked batch over the data axis —
            # images are embarrassingly parallel, XLA propagates the
            # sharding through every stage (params are replicated).  (The
            # tiled path shards its dispatch groups itself.)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            t_img = jax.device_put(t_img, NamedSharding(self._mesh, P("data")))
        if tiled_ok and self._fused_runner is not None:
            t_out = self._fused_runner(None, t_img)
        else:
            t_out = t_img
            for stage in self.stages:
                t_out = stage(t_out, force_whole=not tiled_ok)
                if self.presets.use_guided_filter:
                    t_out = guided_filter(t_img, t_out, r=1, eps=5e-3)
        u8 = _postprocess_u8(t_out, denormalize=self.presets.normalize,
                             batched=True)
        if use_color_fix:
            # batched device-side color transfer against the stacked
            # inputs already on host — same per-image numerics as the
            # run_image spelling (color_fix is batch-independent)
            u8 = color_fix(jnp.asarray(stacked), u8)
        if device_out:
            # per-image DeviceBands, sliced at dispatch time: the encode
            # pool then does pure transfer, overlapping the next group's
            # compute instead of serializing the tunnel-bound fetch here
            return [DeviceBands(u8[i]) for i in range(n_real)]
        out = fetch_np(u8)
        return [out[i] for i in range(n_real)]

    def process(
        self,
        input_dir: str,
        output_dir: str,
        *,
        use_color_fix: bool = False,
        comp: bool = False,
        verbose: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        metrics_dir: Optional[str] = None,
        timers=None,
        batch: int = 1,
    ) -> List[str]:
        """Process a directory of images; returns written paths.

        Decoding of upcoming images runs on native background threads
        (runtime/native.PrefetchLoader) overlapped with device compute;
        PNG ENCODING of finished outputs likewise runs on a background
        thread pool (``INNFER_ENCODE_THREADS``, default 2, 0 = inline) so
        host-side saves overlap the next group's device compute — for
        fast configs a serial 8-MP PNG encode would dominate wall clock
        (VERDICT r4 #1).  Write errors surface at the end-of-run drain.
        ``num_shards``/``shard_index`` stripe the work list for multi-host
        image-level data parallelism (parallel/multihost.py);
        ``metrics_dir`` computes PSNR/SSIM vs same-named ground-truth files.
        ``batch > 1`` groups same-shape prepared images and runs each full
        group as ONE stacked forward (run_batch: tiled for chopped presets,
        whole-image otherwise).  ``batch == 0`` sizes each shape's group
        from the HBM estimator (auto_batch).  Partial groups at
        end-of-directory are padded to the group target only when a full
        group of that shape already compiled this run (reusing the
        executable); never-full buckets run unpadded at natural size.
        """
        from innfer_tpu.parallel.multihost import shard_paths
        from innfer_tpu.runtime.native import PrefetchLoader

        paths = shard_paths(iio.get_images_paths(input_dir), shard_index, num_shards)
        written = []
        loader = PrefetchLoader(
            paths, fallback=lambda p: iio.read_img(p, use_native=False),
        )
        metric_rows = []

        from concurrent.futures import ThreadPoolExecutor

        n_enc = int(os.environ.get("INNFER_ENCODE_THREADS", "2"))
        enc_pool = ThreadPoolExecutor(max_workers=n_enc) if n_enc > 0 else None
        enc_futures = []

        def _finalize(out, dst, img_in, name, image_path):
            """Pool task: fetch (device outputs) -> color-fix -> encode ->
            metrics.  Running the device->host transfer here — not on the
            main loop — lets the (tunnel-expensive) fetch of full SR
            outputs overlap the next image's device compute."""
            if isinstance(out, DeviceBands):
                ctx = timers.stage("fetch") if timers else _nullctx()
                with ctx:
                    out = out.fetch()
            elif not isinstance(out, np.ndarray):
                ctx = timers.stage("fetch") if timers else _nullctx()
                with ctx:
                    out = tensor2np(out, denormalize=self.presets.normalize)
            # color_fix already ran ON DEVICE in run_image/run_batch —
            # applying it here (a pool thread) would fetch + re-upload the
            # full SR output over the tunnel and dispatch out of order
            ctx = timers.stage("encode") if timers else _nullctx()
            with ctx:
                if comp:
                    iio.save_img_comp([img_in, out], dst)
                else:
                    iio.save_img(out, dst)
            if metrics_dir:
                gt = _find_reference(metrics_dir, name)
                if gt is not None and gt.shape != out.shape:
                    # presets that resize/modcrop inputs (wbc, unet/p2p)
                    # legitimately change output geometry vs a same-named
                    # GT file — skip with a note instead of killing the
                    # whole directory run on a broadcasting error
                    print(f"  metrics {name}: skipped — ground truth "
                          f"{gt.shape} != output {out.shape} (the preset "
                          "resized/modcropped the input)")
                elif gt is not None:
                    # host-side metrics: pool threads must not dispatch
                    # device compute (see metrics.ssim_np docstring)
                    from innfer_tpu.metrics import psnr_np, ssim_np

                    row = {
                        "image": name,
                        "psnr": round(psnr_np(out, gt), 3),
                        "ssim": round(ssim_np(
                            out.astype(np.float32) / 255.0,
                            gt.astype(np.float32) / 255.0), 4),
                    }
                    metric_rows.append(row)
                    if verbose:
                        print(f"  metrics {name}: PSNR {row['psnr']} dB, SSIM {row['ssim']}")
            if verbose:
                print(f"{image_path} -> {dst} {out.shape[1]}x{out.shape[0]}")

        def finish(name, image_path, img_in, out):
            dst = osp.join(output_dir, f"{name}.png")
            written.append(dst)
            if enc_pool is None:
                _finalize(out, dst, img_in, name, image_path)
                return
            # backpressure: each queued device output pins ~HBM + host RAM
            # for a full SR image — bound the in-flight finalizes
            while len(enc_futures) >= max(4, 2 * n_enc):
                enc_futures.pop(0).result()
            enc_futures.append(
                enc_pool.submit(_finalize, out, dst, img_in, name, image_path))

        seen_full = set()  # shape keys that compiled a full-batch forward
        targets = {}       # shape key -> resolved group size
        if batch > 1:
            self._fence_cg_batch(batch)  # warn on the known cg-b4 stall

        def flush(group, key):
            names, srcs, imgs = zip(*group)
            # Pad to the full batch ONLY when this shape already compiled
            # a full-batch forward this run (padding then reuses the
            # executable for free).  A bucket that never filled — e.g.
            # every image in a mixed-size directory — pads nothing: it
            # runs at natural size (fresh compile either way), so --batch
            # on a no-two-alike directory costs nothing instead of
            # batch-x redundant compute per image.
            target = targets[key]
            if len(imgs) == target:
                seen_full.add(key)
            pad_to = target if key in seen_full else None
            # "batch" not "image": one sample covers the whole group, so
            # --timing stays honest under --batch N (per-image time =
            # batch time / group size)
            ctx = timers.stage("batch") if timers else _nullctx()
            with ctx:
                outs = self.run_batch(list(imgs), already_prepared=True,
                                      pad_to=pad_to,
                                      use_color_fix=use_color_fix,
                                      device_out=enc_pool is not None)
            for name, src, img_in, out in zip(names, srcs, imgs, outs):
                finish(name, src, img_in, out)

        def timed_read(it):
            # attribute blocking-on-decode time to a "read" stage so
            # --timing splits the product loop into read/compute/encode
            it = iter(it)
            while True:
                ctx = timers.stage("read") if timers else _nullctx()
                with ctx:
                    try:
                        item = next(it)
                    except StopIteration:
                        return
                yield item

        pending = {}
        try:
            for _idx, image_path, img in timed_read(loader):
                name = osp.splitext(osp.basename(image_path))[0]
                if img is None:
                    print(f"Error reading image {image_path}, skipping.")
                    continue
                img_in = self.prepare(img)
                key = (img_in.shape, str(img_in.dtype))
                if key not in targets:
                    targets[key] = (batch if batch > 1
                                    else self.auto_batch(img_in.shape)
                                    if batch == 0 else 1)
                if targets[key] > 1:
                    group = pending.setdefault(key, [])
                    group.append((name, image_path, img_in))
                    if len(group) == targets[key]:
                        flush(group, key)
                        pending[key] = []
                    continue
                ctx = timers.stage("image") if timers else _nullctx()
                with ctx:
                    out = self.run_image(
                        img_in, already_prepared=True,
                        device_out=enc_pool is not None,
                        color_ref=img_in if use_color_fix else None)
                finish(name, image_path, img_in, out)
            for key, group in pending.items():
                if group:
                    flush(group, key)
            if enc_pool is not None:
                for f in enc_futures:
                    f.result()  # surface write errors; raise-on-fail
        except BaseException:
            # a raised encode/write/forward error must not leave queued
            # finalizes writing files (or the prefetch threads decoding)
            # after the caller has already handled the failure
            for f in enc_futures:
                f.cancel()
            raise
        finally:
            loader.close()
            if enc_pool is not None:
                enc_pool.shutdown(wait=True)
        if metric_rows and verbose:
            mean_p = sum(r["psnr"] for r in metric_rows) / len(metric_rows)
            mean_s = sum(r["ssim"] for r in metric_rows) / len(metric_rows)
            print(f"metrics mean over {len(metric_rows)}: PSNR {mean_p:.3f} dB, SSIM {mean_s:.4f}")
        self.last_metrics = metric_rows
        return written
