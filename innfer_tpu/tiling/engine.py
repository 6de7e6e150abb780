"""Static-shape tiled inference engine.

Replaces the reference's serial batch-1 chop loop (run.py:167-202, ~200
forwards per 1080p image with per-patch cuda.empty_cache) with:

  1. one vectorized gather that extracts ALL overlap tiles as a single
     (N, T, T, C) batch (two axis-gathers, no data-dependent shapes),
  2. a chunked, jitted batched forward (lax.map over fixed-size chunks to
     bound activation memory; chunk optionally sharded across a device mesh
     for tile-level data parallelism over ICI),
  3. a fused seam-blend recompose: tiles are weighted by the precomputed
     blend patch and scatter-added into row strips then into the canvas,
     followed by one multiply with the precomputed reciprocal weight canvas
     (all plan constants are baked into the executable).

Everything is compiled per TilePlan; plans are cached by (H, W) bucket.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from innfer_tpu.tiling.plan import (TilePlan, make_auto_plan,
                                    make_cover_plan, make_reference_plan,
                                    make_uniform_plan)

Array = jax.Array


def _pad_to(x: Array, pad_h: int, pad_w: int) -> Array:
    """Reflect-pad (1, H, W, C) up to (pad_h, pad_w); edge padding when the
    pad is too large for reflection."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = pad_h - h, pad_w - w
    if ph == 0 and pw == 0:
        return x
    mode = "reflect" if (ph < h and pw < w) else "edge"
    return jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)], mode=mode)


def pad_image(x: Array, plan: TilePlan) -> Array:
    """Reflect-pad (1, H, W, C) to the plan's padded size."""
    return _pad_to(x, plan.pad_h, plan.pad_w)


def extract_tiles(x: Array, plan: TilePlan) -> Array:
    """(B, pad_h, pad_w, C) -> (B * n_tiles, Th, Tw, C) from static slices.

    Tile starts are compile-time constants, so extraction is a stack of
    plain slices — XLA TPU copies.  (An earlier two-gather formulation
    risked the same poor gather/scatter lowering the recompose hit; see
    recompose_tiles_concat.)  Row strips are sliced once and reused
    across the row's tiles.  A stacked image batch (B > 1, cross-image
    tile stacking) extracts image-major: image 0's tiles first.
    """
    th, tw = plan.tile_h, plan.tile_w
    tiles = []
    for b in range(x.shape[0]):
        strips = [x[b, sh: sh + th] for sh in plan.starts_h]
        tiles += [strip[:, sw: sw + tw]
                  for strip in strips for sw in plan.starts_w]
    if len(tiles) == 1:
        return tiles[0][None]
    return jnp.stack(tiles)


def _axis_segments(starts, t: int, total: int):
    """Static interval decomposition of one axis: split [0, total) at every
    tile boundary into segments, each with the static list of tiles covering
    it.  Lets the recompose run as pure slices+concats (no scatter)."""
    bounds = sorted({0, total, *[s for s in starts], *[s + t for s in starts]})
    bounds = [b for b in bounds if 0 <= b <= total]
    segs = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        cover = [i for i, s in enumerate(starts) if s <= lo and hi <= s + t]
        segs.append((lo, hi, cover))
    return segs


def recompose_tiles_concat(tiles_sr: Array, plan: TilePlan) -> Array:
    """Scatter-free recompose: same accumulate-then-normalize math as
    :func:`recompose_tiles` but built from STATIC slices and concats.

    XLA TPU lowers `.at[idx].add` scatters poorly (measured ~0.4 s of the
    CycleGAN tiled step, tools/glue_probe.py); since every tile start is a
    compile-time constant, the weighted-sum canvas decomposes per axis into
    segments each covered by a static tile set — sum the covering slices,
    concat the segments.  fp32 accumulation, same add order (row-major
    tile order per segment) as the scatter path up to reassociation.
    """
    nh, nw = len(plan.starts_h), len(plan.starts_w)
    tsh, tsw = plan.tile_h * plan.scale, plan.tile_w * plan.scale
    c = tiles_sr.shape[-1]
    hp, wp = plan.pad_h * plan.scale, plan.pad_w * plan.scale

    blend = jnp.asarray(plan.blend)[..., None]
    wt = tiles_sr.astype(jnp.float32) * blend
    wt = wt.reshape(nh, nw, tsh, tsw, c)

    sh = [s * plan.scale for s in plan.starts_h]
    sw = [s * plan.scale for s in plan.starts_w]
    wsegs = _axis_segments(sw, tsw, wp)
    hsegs = _axis_segments(sh, tsh, hp)

    # row strips: per tile-row, concat width segments (sum where covered
    # by 2+ tiles; zero-fill any uncovered gap)
    strips = []
    for i in range(nh):
        pieces = []
        for lo, hi, cover in wsegs:
            if cover:
                p = wt[i, cover[0], :, lo - sw[cover[0]]: hi - sw[cover[0]]]
                for j in cover[1:]:
                    p = p + wt[i, j, :, lo - sw[j]: hi - sw[j]]
            else:
                p = jnp.zeros((tsh, hi - lo, c), jnp.float32)
            pieces.append(p)
        strips.append(pieces[0] if len(pieces) == 1
                      else jnp.concatenate(pieces, axis=1))

    rows = []
    for lo, hi, cover in hsegs:
        if cover:
            p = strips[cover[0]][lo - sh[cover[0]]: hi - sh[cover[0]]]
            for i in cover[1:]:
                p = p + strips[i][lo - sh[i]: hi - sh[i]]
        else:
            p = jnp.zeros((hi - lo, wp, c), jnp.float32)
        rows.append(p)
    canvas = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    canvas = canvas * jnp.asarray(plan.inv_weight)
    return canvas[None, : plan.out_h, : plan.out_w, :]


def recompose_tiles_scatter(tiles_sr: Array, plan: TilePlan) -> Array:
    """(N, Ts, Ts, C) SR tiles -> (1, out_h, out_w, C) blended image.

    Reproduces the reference accumulate-then-normalize semantics
    (utils/utils.py:422-443) as two scatter-adds with static index maps.
    Kept as the A/B reference for :func:`recompose_tiles_concat` (the
    production path, pinned bitwise-equal by
    test_tiling.py::test_concat_matches_scatter); not reachable from
    production code.
    """
    nh, nw = len(plan.starts_h), len(plan.starts_w)
    tsh, tsw = plan.tile_h * plan.scale, plan.tile_w * plan.scale
    c = tiles_sr.shape[-1]
    hp, wp = plan.pad_h * plan.scale, plan.pad_w * plan.scale

    blend = jnp.asarray(plan.blend)[..., None]
    wt = tiles_sr.astype(jnp.float32) * blend

    col_idx = jnp.asarray(
        np.concatenate([s * plan.scale + np.arange(tsw) for s in plan.starts_w])
    )
    row_idx = jnp.asarray(
        np.concatenate([s * plan.scale + np.arange(tsh) for s in plan.starts_h])
    )

    t5 = wt.reshape(nh, nw, tsh, tsw, c).transpose(0, 2, 1, 3, 4).reshape(nh, tsh, nw * tsw, c)
    strips = jnp.zeros((nh, tsh, wp, c), jnp.float32).at[:, :, col_idx, :].add(t5)
    canvas = jnp.zeros((hp, wp, c), jnp.float32).at[row_idx].add(
        strips.reshape(nh * tsh, wp, c)
    )
    canvas = canvas * jnp.asarray(plan.inv_weight)
    return canvas[None, : plan.out_h, : plan.out_w, :]


# The production recompose: the scatter formulation measured ~0.4 s/step
# slower on TPU (XLA lowers .at[].add poorly) and is kept above only as
# the bitwise-pinned A/B reference.
recompose_tiles = recompose_tiles_concat


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def tiled_apply(
    apply_fn: Callable,
    params,
    x: Array,
    plan: TilePlan,
    *,
    tile_batch: int = 8,
    output_index: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    compute_dtype=None,
    max_group_px: int = 1_400_000,
) -> Array:
    """Run ``apply_fn`` over all tiles of ``x`` (B, H, W, C) and recompose.

    Designed to live inside jit: all shapes derive from the static plan.
    ``tile_batch`` is the per-chunk tile count (memory bound); on a mesh it
    must be a multiple of the data-axis size and each chunk is sharded
    across devices.

    B > 1 is cross-image tile stacking (VERDICT r4 #2, no reference
    analogue): tiles from a stack of same-shape images share dispatch
    groups, and the groups GROW toward the measured per-dispatch pixel
    cap (``max_group_px``) — small-spatial configs (CycleGAN/PPON slabs)
    are bound by the per-dispatch floor, so fewer, fuller dispatches
    amortize it exactly as whole-image batching did for pix2pix
    (tools/out/batch_ab.json).
    """
    n_im = x.shape[0]
    xp = pad_image(x, plan)
    tiles = extract_tiles(xp, plan)
    if compute_dtype is not None:
        tiles = tiles.astype(compute_dtype)

    n = plan.n_tiles * n_im
    if mesh is not None:
        chunk = tile_batch
    elif n_im > 1:
        # fill dispatch groups up to the group-px cap; keep the batch dim
        # a multiple of 8 (TPU pads it to 8 anyway, plan.py batch_penalty)
        base = plan.chunk or min(tile_batch, plan.n_tiles)
        cap = max(1, max_group_px // max(1, plan.tile_h * plan.tile_w))
        chunk = min(n, max(base, cap))
        if chunk > 8:
            chunk = (chunk // 8) * 8
    else:
        # the planner may have picked a smaller dispatch group than the
        # engine default (big-tile grids clamped to the group-px cap)
        chunk = plan.chunk or min(tile_batch, n)
    n_padded = _round_up(n, chunk)
    if n_padded != n:
        tiles = jnp.pad(tiles, [(0, n_padded - n), (0, 0), (0, 0), (0, 0)])
    groups = tiles.reshape(n_padded // chunk, chunk, plan.tile_h, plan.tile_w, -1)

    if mesh is not None:
        spec = NamedSharding(mesh, P(None, data_axis, None, None, None))
        groups = jax.lax.with_sharding_constraint(groups, spec)

    def fwd(batch):
        out = apply_fn(params, batch)
        if output_index is not None:
            out = out[output_index]
        return out

    # lax.map over dispatch groups is the one path: a Python-unrolled group
    # loop measured slower on-chip for both backends (tools/out/
    # map_unroll_ab.json, 2026-08-19: cg t192 pallas 40.6 vs 45.4 ms,
    # xla 41.4 vs 43.5), refuting the suspected lax.map+pallas pathology.
    out_tiles = jax.lax.map(fwd, groups)
    tsh, tsw = plan.tile_h * plan.scale, plan.tile_w * plan.scale
    out_tiles = out_tiles.reshape(n_padded, tsh, tsw, -1)[:n]
    if n_im > 1:
        per_im = out_tiles.reshape(n_im, plan.n_tiles, tsh, tsw, -1)
        return jax.vmap(lambda t: recompose_tiles(t, plan)[0])(per_im)
    return recompose_tiles(out_tiles, plan)


def hybrid_dims(h: int, w: int) -> tuple:
    """Kernel-friendly padded dims for a whole-image trunk forward:
    rows to the next 64-multiple (64-row strip blocks), width to the
    candidate in [w, w+63] minimizing padded_px * halo_inflation(bw)
    where bw is the block width the kernel would pick (rdb._wide_bw).
    1080x1920 -> 1088x1920 with 64x240 blocks (_wide_bw caps at
    MAX_WIDE_BW=256 since the round-4 VMEM sweep; halo inflation 1.067,
    whole-trunk px ratio 1.0074 of true px vs the auto tile grid's
    1.138)."""
    from innfer_tpu.ops.pallas.rdb import MAX_BW, _wide_bw

    ph = -(-h // 64) * 64
    best = None
    for pw in range(-(-w // 16) * 16, w + 64, 16):
        bw = pw if pw <= MAX_BW else _wide_bw(pw)
        if bw < 64:
            continue
        cost = ph * pw * (bw + 16) / bw
        if best is None or cost < best[0]:
            best = (cost, pw)
    if best is None:
        best = (0, -(-w // 16) * 16)
    return ph, best[1]


def hybrid_apply(
    trunk_fn: Callable,
    tail_fn: Callable,
    params,
    x: Array,
    plan: TilePlan,
    *,
    tile_batch: int = 8,
    output_index: Optional[int] = None,
    compute_dtype=None,
    out_h: int = 0,
    out_w: int = 0,
) -> Array:
    """Whole-image trunk, tiled tail (models exposing a trunk/tail split).

    The LR trunk carries 96+% of the model's FLOPs; running it UNTILED on
    the padded full image removes all tile overlap/halo recompute (the
    auto grid processes 1.138x the true pixels at 1080p; the hybrid trunk
    1.007x) and is EXACT whole-image math.  Only the cheap upsample tail
    is tiled (activation memory at scale^2 forces that), cut from the
    same feature map with overlap >> the tail's receptive radius, so
    seams carry only blend rounding.  ``plan`` must be a cover plan over
    the trunk-padded dims (plan.pad_h == padded H == trunk output rows).
    """
    xp = _pad_to(x, plan.pad_h, plan.pad_w)
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
    h = trunk_fn(params, xp)

    tiles = extract_tiles(h, plan)
    n = plan.n_tiles
    chunk = plan.chunk or min(tile_batch, n)
    n_padded = _round_up(n, chunk)
    if n_padded != n:
        tiles = jnp.pad(tiles, [(0, n_padded - n), (0, 0), (0, 0), (0, 0)])
    groups = tiles.reshape(
        n_padded // chunk, chunk, plan.tile_h, plan.tile_w, -1)

    def fwd(batch):
        out = tail_fn(params, batch)
        if output_index is not None:
            out = out[output_index]
        return out

    out_tiles = jax.lax.map(fwd, groups)
    tsh, tsw = plan.tile_h * plan.scale, plan.tile_w * plan.scale
    out_tiles = out_tiles.reshape(n_padded, tsh, tsw, -1)[:n]
    canvas = recompose_tiles(out_tiles, plan)
    return canvas[:, : out_h or plan.out_h, : out_w or plan.out_w, :]


class TiledRunner:
    """Convenience wrapper: plan cache + jitted executables per image size.

    The TPU-native replacement for Model.chop_forward + __call__
    (run.py:167-225): arbitrary image sizes hit a small set of compiled
    shapes via bucketing, tiles run as one batched forward (optionally
    sharded across a mesh), and the blend runs fused on device.
    """

    def __init__(
        self,
        apply_fn: Callable,
        scale: int,
        *,
        mode: str = "uniform",
        tile: int = 256,
        overlap: int = 16,
        patch: int = 200,
        step: float = 0.5,
        tile_batch: int = 8,
        bucket: int = 0,
        output_index: Optional[int] = None,
        mesh: Optional[Mesh] = None,
        compute_dtype=None,
        max_group_px: int = 1_400_000,
        tile_quantum: int = 1,
        tile_quantum_strict: bool = False,
        trunk_fn: Callable = None,
        tail_fn: Callable = None,
        tail_halo: int = 0,
    ):
        if mode == "hybrid":
            if trunk_fn is None or tail_fn is None:
                raise ValueError(
                    "hybrid mode requires a model with a trunk/tail split "
                    "(ModelDef.apply_trunk/apply_tail); this architecture "
                    "does not expose one")
            if mesh is not None:
                raise NotImplementedError(
                    "hybrid mode is single-chip; use --spatial for "
                    "multi-chip whole-image forwards")
        self.trunk_fn = trunk_fn
        self.tail_fn = tail_fn
        self.tail_halo = tail_halo
        self.apply_fn = apply_fn
        self.scale = scale
        self.mode = mode
        self.tile = tile
        self.overlap = overlap
        self.patch = patch
        self.step = step
        self.tile_batch = tile_batch
        self.bucket = bucket
        self.max_group_px = max_group_px
        self.tile_quantum = tile_quantum
        self.tile_quantum_strict = tile_quantum_strict
        self.output_index = output_index
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self._compiled = {}
        self._plans = {}

    def _effective_quantum(self, run_dtype=None) -> int:
        """The model's tile_quantum matters only where the fused Pallas RDB
        can actually fire (bf16 activations on the TPU backend, see
        models/rrdb._use_pallas); everywhere else the coarse grid would pay
        extra pixels for zero kernel gain."""
        if self.tile_quantum <= 1:
            return 1
        if self.tile_quantum_strict:
            # explicit kernel opt-in: the forward WILL call the kernel, so
            # the tiles must be compatible regardless of cost or dtype
            return self.tile_quantum
        dt = self.compute_dtype or run_dtype
        if dt is not None and jnp.dtype(dt) != jnp.dtype(jnp.bfloat16):
            return 1
        if jax.default_backend() not in ("tpu", "axon"):
            return 1
        return self.tile_quantum

    # Whole-trunk input-pixel cap for hybrid mode: the fused-kernel HBM
    # buffers cost ~0.5 GB per input MP (2 donated 128-lane canvases) on
    # top of the XLA activations, so a 1080p/1440p/4K input fits easily
    # but an 8K input (33 MP) would OOM the 16 GB HBM; beyond the cap the
    # runner falls back to the auto tile grid for that image size.
    HYBRID_PX_CAP = 9_000_000

    def _hybrid_auto_eligible(self, h: int, w: int, run_dtype=None) -> bool:
        """True when an 'auto' run should upgrade itself to hybrid: the
        model exposes a trunk/tail split, the image fits the HBM px cap,
        we're single-chip, and the trunk's fused Pallas kernel would fire
        on the whole padded image (the measured-faster regime: 19.8 vs
        17.7 MP/s end-to-end at 1080p, round 4).  Mirrors
        _effective_quantum's backend/dtype gating so CPU/fp32 runs keep
        the plain tile grid."""
        if self.trunk_fn is None or self.tail_fn is None or self.mesh is not None:
            return False
        if h * w > self.HYBRID_PX_CAP:
            return False
        if self._effective_quantum(run_dtype) <= 1:
            return False
        from innfer_tpu.ops.pallas import tile_pallas_fast

        ph, pw = hybrid_dims(h, w)
        return tile_pallas_fast(ph, pw)

    def _mode_for(self, h: int, w: int, run_dtype=None) -> str:
        if self.mode == "hybrid" and h * w > self.HYBRID_PX_CAP:
            return "auto"
        if self.mode == "auto" and self._hybrid_auto_eligible(h, w, run_dtype):
            return "hybrid"
        return self.mode

    def plan_for(self, h: int, w: int, run_dtype=None) -> TilePlan:
        quantum = self._effective_quantum(run_dtype)
        plan = self._plans.get((h, w, quantum))
        if plan is None:
            mode = self._mode_for(h, w, run_dtype)
            if mode == "hybrid":
                ph, pw = hybrid_dims(h, w)
                if isinstance(self.tile, (tuple, list)):
                    # user-specified tail grid: respect it, but clamp the
                    # overlap up to the seam-exactness bound (the tail
                    # tile overlap must exceed the tail's receptive
                    # radius, hybrid_apply docstring) rather than
                    # silently produce seam artifacts
                    tl = self.tile
                    ov = max(self.overlap, 2 * self.tail_halo)
                    if ov > self.overlap:
                        import logging

                        logging.getLogger("innfer_tpu").warning(
                            "hybrid mode: overlap %d < 2*tail_halo (%d); "
                            "clamping to %d for seam-exactness",
                            self.overlap, 2 * self.tail_halo, ov)
                else:
                    # planner-owned lean tail grid: the trunk is seamless
                    # whole-image math, so tail overlap beyond the seam-
                    # exactness bound (2*tail_halo) only reprocesses
                    # pixels.  At the minimal overlap, pick the tile
                    # height that exactly covers the padded rows in the
                    # row count a 576-tall anchor would use: 1088 rows ->
                    # 2 rows of 548, processed ratio 1.0745 vs the old
                    # 576/ov16 grid's 1.1294 — measured faster end to end
                    # same-window (19.89 vs 19.75 MP/s at 1080p,
                    # tools/out/hybrid_breakdown.json, round 4).
                    # tail_halo defaults to 0 for library callers that
                    # construct a hybrid runner without the kwarg — fall
                    # back to their explicit overlap rather than cutting
                    # a zero-overlap (unblended) tail grid
                    ov = 2 * self.tail_halo or self.overlap
                    if 2 * self.tail_halo and self.overlap > ov:
                        import logging

                        logging.getLogger("innfer_tpu").info(
                            "hybrid mode: planner-owned tail grid uses the "
                            "seam-exactness overlap %d (2*tail_halo); the "
                            "configured overlap %d only applies to tiled "
                            "modes (pass --tile HxW to pin a custom hybrid "
                            "tail grid honoring it)",
                            ov, self.overlap)
                    anchor = 576
                    n_rows = max(1, -(-(ph - ov) // (anchor - ov)))
                    th = -(-(ph + (n_rows - 1) * ov) // n_rows)
                    tl = (th, min(self.tile, 256))
                plan = make_cover_plan(
                    ph, pw, self.scale, tile_h=min(ph, tl[0]),
                    tile_w=min(pw, tl[1]), overlap=ov)
            elif mode == "reference":
                plan = make_reference_plan(h, w, self.scale, patch=self.patch, step=self.step)
            elif mode == "auto":
                plan = make_auto_plan(
                    h, w, self.scale, overlap=self.overlap,
                    tile_batch=self.tile_batch,
                    max_group_px=self.max_group_px,
                    align=max(8, quantum),
                    align_strict=self.tile_quantum_strict,
                    fixed_chunk=self.mesh is not None,
                )
            elif isinstance(self.tile, (tuple, list)):
                plan = make_uniform_plan(
                    h, w, self.scale, tile_h=self.tile[0], tile_w=self.tile[1],
                    overlap=self.overlap, bucket=self.bucket,
                )
            else:
                plan = make_uniform_plan(
                    h, w, self.scale, tile=self.tile, overlap=self.overlap, bucket=self.bucket
                )
            self._plans[(h, w, quantum)] = plan
        return plan

    def __call__(self, params, x: Array) -> Array:
        h, w = x.shape[1], x.shape[2]
        plan = self.plan_for(h, w, run_dtype=x.dtype)
        if x.shape[0] > 1 and self._mode_for(h, w, x.dtype) == "hybrid":
            # hybrid's whole-image trunk runs the fused Pallas kernel on a
            # single-image canvas; a stacked batch loops the (compiled)
            # single-image path — ESRGAN-class configs are FLOP-bound at
            # hybrid-eligible sizes, not dispatch-floor-bound, so stacking
            # buys nothing there anyway (cross-image stacking targets the
            # small-spatial tiled configs)
            return jnp.concatenate(
                [self(params, x[i:i + 1]) for i in range(x.shape[0])], axis=0)
        key = (plan.pad_h, plan.pad_w, plan.tile_h, plan.tile_w, x.dtype,
               x.shape[-1], h, w, x.shape[0])
        fn = self._compiled.get(key)
        if fn is None:
            if self._mode_for(h, w, x.dtype) == "hybrid":
                fn = jax.jit(
                    functools.partial(
                        hybrid_apply,
                        self.trunk_fn,
                        self.tail_fn,
                        tile_batch=self.tile_batch,
                        output_index=self.output_index,
                        compute_dtype=self.compute_dtype,
                        out_h=h * self.scale,
                        out_w=w * self.scale,
                    ),
                    static_argnames=("plan",),
                )
            else:
                fn = jax.jit(
                    functools.partial(
                        tiled_apply,
                        self.apply_fn,
                        tile_batch=self.tile_batch,
                        output_index=self.output_index,
                        mesh=self.mesh,
                        compute_dtype=self.compute_dtype,
                        max_group_px=self.max_group_px,
                    ),
                    static_argnames=("plan",),
                )
            self._compiled[key] = fn
        return fn(params, x, plan=plan)
