"""Fused Residual Dense Block (RDB_5C) Pallas TPU kernel.

The ESRGAN trunk is 23 RRDB x 3 RDB x 5 chained 3x3 convs — ~96% of model
FLOPs (reference RRDBNet_arch.py:100-165).  XLA runs each conv as a
separate HBM-materialized im2col + narrow-N matmul (measured ~24 TF/s on
v5e).  This kernel fuses one whole RDB:

  * the input block (plus a 5-pixel halo) is DMA'd to VMEM once; all five
    convs run without touching HBM again,
  * convs use the mathematically-identical "scatter-wide" form: since
    conv_c(cat(x, x1..x_{c-1})) = sum_s conv_c_slice_s(x_s), each SOURCE
    does one wide matmul into all later targets' pre-activation columns
    (N = 192/160/128/96/64 instead of 32 — fills the 128-wide MXU),
  * the 3x3 taps are K-packed: per vertical offset dy one matmul with
    K = 3*C_src over an in-VMEM column trio (im2col exists only in VMEM),
  * zero-padding semantics of the per-conv torch convs are reproduced by
    masking intermediates outside the global tile extent.

Mosaic constraints shape the implementation: DMA slices must be
lane/sublane aligned (input channels padded to 128, window width padded to
a multiple of 8) and refs are never lane-sliced — all intermediate math is
value-based (registers/VMEM managed by Mosaic).

ESRGAN+ 'plus' cross-residuals (conv1x1 + x2-into-x4, RRDBNet_arch.py:
155-160) are applied at the activation step, matching the reference's
post-activation placement.
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5          # receptive radius of 5 chained 3x3 convs
LANE = 128        # TPU lane width
W_SLACK = 6       # extra right-pad so the DMA window width is 8-aligned
# Chain mode (fused_rrdb_trunk) keeps activations in a persistent padded
# layout between RDB calls; its column margins are 8 (5 halo + 3 align)
# on BOTH sides so the interior write DMA starts on an 8-sublane boundary
# (8 + bw*j).  Total padded width is tw + 16 — identical to the standard
# mode's 5 + 5 + W_SLACK, so canvas and scratch shapes are shared.
COL_MARGIN = 8

# Layout canonicalization of the suffix accumulator's activation tail
# slice: "none" = trust Mosaic's implicit relayout (default; measured
# faster AND exact on this backend: 45.0 vs 40.9 TF/s same-window with
# identical parity, tools/out/tail_canon_ab.json, and bit-exact vs the
# canonicalized form in an earlier A/B), "axis0" = net-zero f32
# double-roll (the round-3 form; keep as a fallback if a future
# backend/jax rev reintroduces the "offset mismatch on non-concat
# dimension" Mosaic error this guarded against).
TAIL_CANON = os.environ.get("INNFER_TAIL_CANON", "none")

# Rejected experiments (round-4 cleanup; dated artifacts in tools/out/):
#   * activation-tail PREFIX slice ablation (wrong math, isolated Mosaic's
#     relayout cost of the lane-offset suffix slice): kernel_cost_sweep.json
#     "prefix_tail" — the cost is mostly recovered exactly by TAIL_WIDE_BF16.
#   * SRC0_PACK9 (wide source as one K=9*nf dot): measured a net loss in
#     rounds 2 AND 3 (kernel_cost_sweep.json "src0_pack9") — the (pp, 9*nf)
#     VMEM im2col concat costs more than the MXU K-padding it saves.

# Exact-math experiment hooks for the two dominant VPU costs measured by
# tools/kernel_cost_sweep.py (base 44.9 / no-dx 56.5 / offset-0 tail 59.3
# / both 71.0 TF/s):
#   DX_MODE "roll"  = the +-1 horizontal-tap shifts as f32 dynamic
#                     rotates (tpu.dynamic_rotate is 32-bit only);
#           "slice" = native-dtype slice + zero-concat, trusting Mosaic's
#                     implicit relayout of the 1-row-offset value (the
#                     same trade TAIL_CANON="none" won for lane offsets).
#   TAIL_WIDE_BF16  = activate/mask the FULL accumulator width in f32 and
#                     cast to bf16 BEFORE the gc-column tail slice:
#                     halves the bytes Mosaic relays out.  Garbage act
#                     columns are sliced away; the tail columns are exact.
# On-chip verdict (tools/out/dx_tail_exact_ab.json, peak-156.8 window):
# tail_wide 47.2 vs base 44.8 TF/s with BITWISE parity -> DEFAULT ON.
# dx_slice (and hence "both") crashes the remote Mosaic compiler (HTTP
# 500, the offset-mismatch-concat class) -> keep "roll"; the ~11.6 TF/s
# dx cost stands until a backend rev accepts sublane-offset concats.
def _default_dx_mode() -> str:
    """Env override wins; else the persistent dx_slice compile-probe
    verdict (ops/pallas/levers.py) upgrades to 'slice' when a backend rev
    fixes the offset-mismatch-concat crash; else the safe 'roll'."""
    env = os.environ.get("INNFER_DX_MODE")
    if env:
        return env
    from innfer_tpu.ops.pallas.levers import lever_enabled

    return "slice" if lever_enabled("dx_slice") else "roll"


# Resolved LAZILY at first kernel trace: _default_dx_mode consults the
# persistent lever cache, which keys on jax.default_backend() — resolving
# at import would initialize the JAX backend as an import side effect
# (hangs on a downed tunnel; locks the platform before a CPU-forcing
# script's jax.config.update).  Tests/tools may still set R.DX_MODE
# directly; a non-None value always wins.
DX_MODE: "str | None" = None


def _dx_mode() -> str:
    global DX_MODE
    if DX_MODE is None:
        DX_MODE = _default_dx_mode()
    return DX_MODE


TAIL_WIDE_BF16 = os.environ.get("INNFER_TAIL_WIDE", "1") == "1"
# Round-4 hook-sweep verdict (VERDICT r3 #6): TAIL_WIDE + TAIL_CANON stay
# as ONE documented fallback chain, not independent experiments.  The
# production path (TAIL_WIDE=1) slices a lane-offset bf16 value and
# trusts Mosaic's implicit relayout — the exact operation the recorded
# "offset mismatch on non-concat dimension" compiler error class breaks.
# If a backend rev reintroduces it, the recovery is INNFER_TAIL_WIDE=0
# INNFER_TAIL_CANON=axis0 (explicit f32 canonicalization, exact, -4 TF/s).
# Artifacts: dx_tail_exact_ab.json (tail_wide 47.2 vs 44.8, bitwise),
# tail_canon_ab.json (none 45.0 vs axis0 40.9, exact parity).


def _pack_source_weights(weights: List[jax.Array], nf: int, gc: int):
    """Per-source fully-K-packed 9-tap weights: wt[s] (9*C_s, N_s).

    Row order is (dy, dx, channel), matching the in-kernel 9-way shifted
    concat of the source.  Target columns are packed in REVERSED order
    [x5 | x4 | ... | x_{s+1}]: the suffix accumulator then keeps every
    SURVIVING target at a column prefix, so the per-stage shrink is a
    free offset-0 slice and only the narrow (pp, gc) activation tail
    needs a layout-canonicalizing roll (see _rdb_compute; the forward
    packing's wide drop-column lane-rolls measured as the kernel's
    single largest VPU cost, tools/kernel_cost_sweep.py round 3)."""
    packed = []
    for s in range(5):
        c_s = nf if s == 0 else gc
        lo = 0 if s == 0 else nf + (s - 1) * gc
        parts = [weights[c - 1][:, :, lo: lo + c_s, :] for c in range(5, s, -1)]
        cat = jnp.concatenate(parts, axis=-1)          # (3, 3, C_s, N_s)
        dy, dx, ci, n = cat.shape
        packed.append(cat.reshape(dy * dx * ci, n))
    return packed


def _shift_rows(v: jax.Array, k: int) -> jax.Array:
    """Value with rows shifted so out[i] = v[i + k].

    Shifted-in rows are garbage (wrap or zero), but they land only in the
    outermost halo ring of the flat canvas, and 5 chained convs propagate
    boundary garbage at most 5 rings inward — exactly the halo the output
    crop discards (see kernel docstring).

    Mosaic constraints dictate two code paths:
      * |k| multiple of the 16-row bf16 sublane tile: slice+concat keeps
        tile-aligned layouts (used for the +-wp vertical-tap shifts),
      * small |k| (the +-1 horizontal-tap shifts): tpu.dynamic_rotate only
        supports 32-bit data, so roll in float32 and cast back.
    """
    if k == 0:
        return v
    if k % 16 == 0 or _dx_mode() == "slice":
        z = jnp.zeros((abs(k), v.shape[1]), v.dtype)
        if k > 0:
            return jnp.concatenate([v[k:], z], axis=0)
        return jnp.concatenate([z, v[:k]], axis=0)
    rolled = pltpu.roll(v.astype(jnp.float32), (-k) % v.shape[0], 0)
    return rolled.astype(v.dtype)


def _canon(a: jax.Array, pp: int) -> jax.Array:
    """Net-zero f32 double rotate: forces a canonical (offset-0) layout.
    Lane-offset layouts (e.g. from value column slices) poison later
    shifted concats ("offset mismatch on non-concat dimension")."""
    return pltpu.roll(pltpu.roll(a.astype(jnp.float32), 8, 0), pp - 8, 0)


def _tile_valid_mask(by, bx, *, bh, bw, wp, pp, t_h, t_w, halo,
                     col_off=None):
    """(pp, 1) mask of canvas positions whose GLOBAL coords fall inside the
    tile: everything else must read as zero for the next conv (the
    reference zero-pads every conv at the tile extent).  ``col_off`` is
    the padded-layout column where tile content starts (HALO in standard
    mode — the default — or COL_MARGIN in chain mode)."""
    if col_off is None:
        col_off = halo
    rowid = jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0) // wp
    colid = jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0) % wp
    g_row = by * bh + rowid
    g_col = bx * bw + colid
    return (
        (g_row >= halo) & (g_row < halo + t_h)
        & (g_col >= col_off) & (g_col < col_off + t_w)
    )


def _rdb_compute(
    x_vm_slot, by, bx, wt0, wt1, wt2, wt3, wt4, bias, w1x1,
    *, nf: int, gc: int, bh: int, bw: int, t_h: int, t_w: int, plus: bool,
    neg_slope: float, col_off: int = HALO, res_vm_slot=None,
):
    """The conv-chain body shared by the serial and pipelined drivers:
    VMEM canvas in, (bh, bw, LANE) block value out.

    ``res_vm_slot``: optional (bh, bw, LANE) residual block; when given
    the return is rdb(x)*0.2 + res (the RRDB residual fused in, chain
    mode's last per-RRDB call)."""
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK
    pp = hp * wp
    n_total = 4 * gc + nf

    xf = x_vm_slot[:].reshape(pp, LANE)[:, :nf]  # drop the lane padding

    valid = _tile_valid_mask(by, bx, bh=bh, bw=bw, wp=wp, pp=pp,
                             t_h=t_h, t_w=t_w, halo=HALO, col_off=col_off)

    def source_contrib(src, wt_ref):
        """Per-source K-packed matmuls; the 9-tap im2col exists only as a
        VMEM lane-concat.  Built hierarchically to minimize expensive
        rotates — the dx +-1 shifts are two f32 rolls, the dy +-wp shifts
        of the trio are tile-aligned slice+concats (wp is a 16-row
        multiple).  Wide sources (nf) split the dot per dy to bound the
        live concat at (pp, 3*c_s) and avoid VMEM stack overflow."""
        c_s = src.shape[1]
        trio = jnp.concatenate(
            [_shift_rows(src, -1), src, _shift_rows(src, 1)], axis=1
        )  # (pp, 3*c_s): [src[j-1], src[j], src[j+1]]
        w = wt_ref[:]
        # One dot per vertical tap instead of materializing the full
        # (pp, 9*c_s) im2col: the 9-wide concat costs an extra write+read
        # of ~7 MB/source of VMEM traffic per block, while three K=3*c_s
        # dots read the shifted trios directly with identical MXU padding
        # (K=96 and K=288 both pad 4/3 against the 128-lane K tile).
        acc = jnp.dot(_shift_rows(trio, -wp), w[: 3 * c_s],
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(trio, w[3 * c_s: 6 * c_s],
                            preferred_element_type=jnp.float32)
        return acc + jnp.dot(_shift_rows(trio, wp), w[6 * c_s:],
                             preferred_element_type=jnp.float32)

    def tail_act(v):
        """Activation of the CURRENT target: the last gc accumulator
        columns.  The column slice carries a lane-offset layout; with
        the reversed-suffix packing Mosaic's implicit relayout handles
        it correctly and FASTER than forcing offset 0 ourselves
        (TAIL_CANON="none", 45.0 vs 40.9 TF/s same-window, exact
        parity — tools/out/tail_canon_ab.json).  The "axis0" fallback
        is the round-3 explicit canonicalization: an axis-0 net-zero
        f32 double-roll on the narrow (pp, gc) value (an axis-1 lane
        double-roll measured CATASTROPHIC, 31.6 vs 43.3 TF/s)."""
        n = v.shape[1]
        if TAIL_WIDE_BF16:
            # full-width activation + mask in f32, ONE cast to the
            # activation dtype, then the offset slice happens on half
            # the bytes (see TAIL_WIDE_BF16 above).  Exact: non-tail
            # columns of the act copy are discarded by the slice.
            a = jnp.where(v >= 0, v, v * neg_slope)
            a = jnp.where(valid, a, 0.0).astype(xf.dtype)
            return a[:, n - gc:]
        pre = v[:, n - gc:]
        if TAIL_CANON == "axis0":
            pre = _canon(pre, pp)
        a = jnp.where(pre >= 0, pre, pre * neg_slope)
        a = jnp.where(valid, a, 0.0)
        return a.astype(xf.dtype)

    # Suffix accumulation, reversed packing: R holds the fp32 pre-
    # activation partial sums of the REMAINING targets as [x5 | x4 | ...
    # | x_{s+1}], shrinking 192->160->128->96->64.  Each stage's shrink
    # is a free offset-0 prefix slice; only the gc-wide activation tail
    # pays a canonicalization roll (tools/kernel_cost_sweep.py: the
    # forward packing's wide lane-rolls cost ~16 TF/s of the ~27 TF/s
    # gap to the inflation ceiling).
    R = jnp.broadcast_to(bias[:], (pp, n_total)).astype(jnp.float32)
    R = R + source_contrib(xf, wt0)
    x1 = tail_act(R)
    R = R[:, : n_total - gc] + source_contrib(x1, wt1)
    x2 = tail_act(R)
    if plus:
        p = jnp.dot(xf, w1x1[:], preferred_element_type=jnp.float32)
        x2 = x2 + jnp.where(valid, p, 0.0).astype(xf.dtype)
    R = R[:, : n_total - 2 * gc] + source_contrib(x2, wt2)
    x3 = tail_act(R)
    R = R[:, : n_total - 3 * gc] + source_contrib(x3, wt3)
    x4 = tail_act(R)
    if plus:
        x4 = x4 + x2
    R = R[:, :nf] + source_contrib(x4, wt4)

    x5 = R
    out = (x5 * 0.2 + xf.astype(jnp.float32)).astype(xf.dtype)
    # pad lanes back to 128 so the HBM DMA slice is lane-aligned
    out = jnp.concatenate(
        [out, jnp.zeros((pp, LANE - nf), out.dtype)], axis=1
    )
    out3 = out.reshape(hp, wp, LANE)
    blk = out3[HALO: HALO + bh, col_off: col_off + bw, :]
    if res_vm_slot is not None:
        # fused RRDB residual: rdb(x)*0.2 + res, in the activation dtype
        # (matches the XLA path's bf16 arithmetic order).  res lanes
        # nf..LANE are zero by the chain invariant, so the padding lanes
        # stay zero.
        blk = blk * jnp.asarray(0.2, blk.dtype) + res_vm_slot[:]
    return blk


def _rdb_kernel(
    *args,
    nf: int, gc: int, bh: int, bw: int, t_h: int, t_w: int, plus: bool,
    neg_slope: float, acc_dtype, has_res: bool = False,
    col_off: int = HALO, out_ro: int = 0, out_co: int = 0,
):
    """Serial driver: blocking DMA in -> compute -> blocking DMA out.

    Chain mode (has_res / padded out offsets): the operand list gains a
    res_hbm input, the output window lands at (out_ro + by*bh,
    out_co + bx*bw) inside a padded-layout buffer, and the residual block
    is read from the same window of res_hbm.  In standard mode the
    operand list is exactly the pre-chain one (no dead res input).
    """
    if has_res:
        (xp_hbm, wt0, wt1, wt2, wt3, wt4, bias, w1x1, res_hbm, _out_buf,
         out_ref, x_vm, out_vm, res_vm, sem, sem_out, sem_res) = args
    else:
        (xp_hbm, wt0, wt1, wt2, wt3, wt4, bias, w1x1, _out_buf,
         out_ref, x_vm, out_vm, sem, sem_out) = args
        res_vm = None
    by = pl.program_id(1)
    bx = pl.program_id(2)
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK

    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.program_id(0), pl.ds(by * bh, hp), pl.ds(bx * bw, wp), :],
        x_vm, sem,
    )
    cp.start()
    if has_res:
        cpr = pltpu.make_async_copy(
            res_hbm.at[pl.program_id(0), pl.ds(out_ro + by * bh, bh),
                       pl.ds(out_co + bx * bw, bw), :],
            res_vm, sem_res,
        )
        cpr.start()
        cpr.wait()
    cp.wait()

    out_vm[:] = _rdb_compute(
        x_vm, by, bx, wt0, wt1, wt2, wt3, wt4, bias, w1x1,
        nf=nf, gc=gc, bh=bh, bw=bw, t_h=t_h, t_w=t_w, plus=plus,
        neg_slope=neg_slope, col_off=col_off, res_vm_slot=res_vm,
    )
    cpo = pltpu.make_async_copy(
        out_vm,
        out_ref.at[pl.program_id(0), pl.ds(out_ro + by * bh, bh),
                   pl.ds(out_co + bx * bw, bw), :],
        sem_out,
    )
    cpo.start()
    cpo.wait()


def _rdb_kernel_pipelined(
    *args,
    nf: int, gc: int, bh: int, bw: int, t_h: int, t_w: int, plus: bool,
    neg_slope: float, acc_dtype, nby: int, nbx: int, total: int,
    has_res: bool = False, col_off: int = HALO, out_ro: int = 0,
    out_co: int = 0,
):
    """Double-buffered driver: the input DMA for block i+1 and the output
    DMA for block i both run while block i+1's neighbors compute, hiding
    the HBM round-trip behind the matmuls (the serial driver spends ~25%
    of block time in blocking DMA waits).

    Scratch carries 2 slots; grid steps alternate.  Each in-copy is started
    one step early (prologue starts block 0), each out-copy is awaited two
    steps later just before its slot is rewritten (epilogue drains the last
    two).  Pallas TPU guarantees sequential grid iteration on one core and
    scratch/semaphore persistence across iterations, which is what makes
    this bookkeeping sound.

    Chain mode (has_res / padded out offsets): output and residual
    windows land at (out_ro + by*bh, out_co + bx*bw) inside padded-layout
    buffers; the residual copy is double-buffered alongside the input.
    """
    if has_res:
        (xp_hbm, wt0, wt1, wt2, wt3, wt4, bias, w1x1, res_hbm, _out_buf,
         out_ref, x_vm, out_vm, res_vm, sem_in, sem_out, sem_res) = args
    else:
        (xp_hbm, wt0, wt1, wt2, wt3, wt4, bias, w1x1, _out_buf,
         out_ref, x_vm, out_vm, sem_in, sem_out) = args
        res_vm = None
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK
    per_img = nby * nbx
    pb, by, bx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    i = (pb * nby + by) * nbx + bx
    slot = jax.lax.rem(i, 2)

    def _coords(j):
        pbj = jax.lax.div(j, per_img)
        rj = jax.lax.rem(j, per_img)
        return pbj, jax.lax.div(rj, nbx), jax.lax.rem(rj, nbx)

    def in_copy(j, slot_j):
        pbj, byj, bxj = _coords(j)
        return pltpu.make_async_copy(
            xp_hbm.at[pbj, pl.ds(byj * bh, hp), pl.ds(bxj * bw, wp), :],
            x_vm.at[slot_j], sem_in.at[slot_j],
        )

    def res_copy(j, slot_j):
        pbj, byj, bxj = _coords(j)
        return pltpu.make_async_copy(
            res_hbm.at[pbj, pl.ds(out_ro + byj * bh, bh),
                       pl.ds(out_co + bxj * bw, bw), :],
            res_vm.at[slot_j], sem_res.at[slot_j],
        )

    def out_copy(j, slot_j):
        pbj, byj, bxj = _coords(j)
        return pltpu.make_async_copy(
            out_vm.at[slot_j],
            out_ref.at[pbj, pl.ds(out_ro + byj * bh, bh),
                       pl.ds(out_co + bxj * bw, bw), :],
            sem_out.at[slot_j],
        )

    @pl.when(i == 0)
    def _():
        in_copy(i, slot).start()
        if has_res:
            res_copy(i, slot).start()

    @pl.when(i + 1 < total)
    def _():
        in_copy(i + 1, jax.lax.rem(i + 1, 2)).start()
        if has_res:
            res_copy(i + 1, jax.lax.rem(i + 1, 2)).start()

    in_copy(i, slot).wait()
    if has_res:
        res_copy(i, slot).wait()

    blk = _rdb_compute(
        x_vm.at[slot], by, bx, wt0, wt1, wt2, wt3, wt4, bias, w1x1,
        nf=nf, gc=gc, bh=bh, bw=bw, t_h=t_h, t_w=t_w, plus=plus,
        neg_slope=neg_slope, col_off=col_off,
        res_vm_slot=None if res_vm is None else res_vm.at[slot],
    )

    @pl.when(i >= 2)
    def _():
        # the DMA launched two steps ago from this slot must land before
        # the slot is rewritten
        out_copy(i - 2, slot).wait()

    out_vm[slot] = blk
    out_copy(i, slot).start()

    @pl.when(i == total - 1)
    def _():
        out_copy(i, slot).wait()

    if total >= 2:
        @pl.when(i == total - 1)
        def _():
            out_copy(i - 1, jax.lax.rem(i - 1, 2)).wait()


MAX_BW = int(os.environ.get("INNFER_MAX_BW", "320"))
# Wide tiles (width > MAX_BW, i.e. the hybrid whole-image trunk) use a
# LOWER block-width cap than full-width strips: a bw=320 block on a
# 1088x1920 trunk needs 123.5M of scoped VMEM — over the backend's 100M
# budget (it only compiles at INNFER_VMEM_MB=124, 3M below the chip's
# physical VMEM) and measured within window noise of bw=240 anyway
# (19.88 vs 19.77 MP/s end-to-end, round 4).  240 fits the standard
# budget with margin; halo inflation 1.067 vs 1.05.
MAX_WIDE_BW = int(os.environ.get("INNFER_MAX_WIDE_BW", "256"))


def _wide_bw(tw: int) -> int:
    """Largest 16-multiple divisor of a wide tile width in [64,
    MAX_WIDE_BW] (0 if none): the block width for tiles wider than one
    strip, e.g. the hybrid whole-image trunk (1920 -> 240).  Larger bw =
    lower halo inflation ((bw+16)/bw), so take the largest that fits the
    scoped-VMEM budget."""
    for bw in range(min(MAX_WIDE_BW, tw) // 16 * 16, 48, -16):
        if tw % bw == 0:
            return bw
    return 0


def _auto_block(th: int, tw: int) -> Tuple[int, int]:
    """Default kernel block: a full-width strip when VMEM allows.

    The halo canvas costs (bh+10)(bw+16)/(bh*bw) extra compute per block;
    full-width strips amortize the 16-lane width pad over the whole tile
    row (inflation 1.23 at 64xW vs 1.445 at 64x64) and measured fastest
    on-chip (tools/kernel_sweep.py round 3: 43.2 TF/s for 64x256 strips vs
    37.5 for 64x64 in the same window).  The width cap keeps the suffix
    accumulator (pp, 192) fp32 + double-buffered slabs well inside the
    VMEM budget; wider tiles (whole-image trunk) use the largest 16-mult
    divisor <= the cap as the block width (_wide_bw)."""
    if tw % 16 == 0:
        bw = tw if tw <= MAX_BW else _wide_bw(tw)
        if bw >= 64:
            # 96-row strips measured ~+10% (tools/out/strip_height_ab.json)
            # but exhaust the current remote compiler's VMEM budget; the
            # persistent strip96 probe verdict (levers.py) harvests a
            # future compiler fix automatically.  Do NOT widen these caps
            # without a sweep (CLAUDE.md).
            from innfer_tpu.ops.pallas.levers import lever_enabled

            heights = (96, 64, 48, 32) if lever_enabled("strip96") \
                else (64, 48, 32)
            for bh in heights:
                if th % bh == 0:
                    return (bh, bw)
    return (64, 64)


def _pick_block(tdim: int, pref: int) -> int:
    """Largest workable kernel block for a tile dimension: the preferred
    size when it divides the dim, else the dim itself (small tiles), else
    the largest 16-multiple divisor.  Rectangular tiles pick per-dim."""
    bdim = min(pref, tdim)
    if tdim % bdim == 0:
        return bdim
    if tdim <= 128:
        return tdim
    for d in (128, 64, 32, 16):
        if tdim % d == 0:
            return d
    raise ValueError(
        f"tile dim {tdim} has no 16-multiple block divisor; pad the tile "
        "plan to a 16-multiple (tile_quantum)")


def fused_rdb(
    x: jax.Array,
    weights: List[jax.Array],
    biases: List[jax.Array],
    *,
    gc: int = 32,
    plus: bool = False,
    conv1x1_w: Optional[jax.Array] = None,
    # None = auto (_auto_block): full-width strips where VMEM allows,
    # else 64x64.  Measured round 3 (same window): 64x64 serial 35.4,
    # 64x64 pipelined 37.5, 64x256 strip 43.2 TF/s; strip Mosaic compile
    # ~2 min (once per shape, persisted by the compilation cache).
    block: Optional[Tuple[int, int]] = None,
    acc_dtype=jnp.float32,
    neg_slope: float = 0.2,
    interpret: bool = False,
    pipelined: bool = True,
) -> jax.Array:
    """One fused ResidualDenseBlock_5C forward.

    x: (B, T, T, nf); weights[c]: HWIO (3,3,nf+c*gc,gc|nf); biases[c]: (Cout,).
    Returns (B, T, T, nf) = conv-chain output * 0.2 + x.
    """
    b, th, tw, nf = x.shape
    if block is None:
        block = _auto_block(th, tw)
    bh, bw = _pick_block(th, block[0]), _pick_block(tw, block[1])
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK
    assert wp % 16 == 0, (
        f"canvas width {wp} must be a 16-row tile multiple (pick bw in 16s)"
    )

    wt, bias_vec, w1 = _prep_params(
        weights, biases, nf=nf, gc=gc, plus=plus, conv1x1_w=conv1x1_w,
        dtype=x.dtype)

    # zero pad: halo on all sides, extra right slack for DMA alignment, and
    # channel padding to the 128-lane tile
    xp = jnp.pad(
        x,
        [(0, 0), (HALO, HALO), (HALO, HALO + W_SLACK), (0, LANE - nf)],
    )

    out_buf = jnp.zeros((b, th, tw, LANE), x.dtype)
    res = jnp.zeros((1, 1, 1, LANE), x.dtype)  # unused (has_res=False)
    return _call_rdb(
        xp, wt, bias_vec, w1, res, out_buf, nf=nf, gc=gc, bh=bh, bw=bw,
        th=th, tw=tw, plus=plus, neg_slope=neg_slope, acc_dtype=acc_dtype,
        interpret=interpret, pipelined=pipelined, padded_io=False,
        has_res=False,
    )[..., :nf]


def _prep_params(weights, biases, *, nf, gc, plus, conv1x1_w, dtype):
    """Pack weights/bias/conv1x1 for the kernel (see
    _pack_source_weights): reversed target order [b5 | b4 | ... | b1]."""
    wt = _pack_source_weights(weights, nf, gc)
    bias_vec = jnp.concatenate(
        [bs.astype(jnp.float32) for bs in reversed(biases)])[None, :]
    w1 = (
        conv1x1_w.reshape(nf, gc)
        if (plus and conv1x1_w is not None)
        else jnp.zeros((nf, gc), dtype)
    ).astype(dtype)
    return wt, bias_vec, w1


def _call_rdb(
    xp, wt, bias_vec, w1, res, out_buf, *, nf, gc, bh, bw, th, tw, plus,
    neg_slope, acc_dtype, interpret, pipelined, padded_io, has_res,
):
    """Shared pallas_call constructor for the standard (unpadded output)
    and chain (padded persistent layout) modes."""
    b = xp.shape[0]
    hp, wp = bh + 2 * HALO, bw + 2 * HALO + W_SLACK
    col_off = COL_MARGIN if padded_io else HALO
    out_ro = HALO if padded_io else 0
    out_co = COL_MARGIN if padded_io else 0
    nby, nbx = th // bh, tw // bw
    grid = (b, nby, nbx)
    if pipelined and not interpret:
        kernel = functools.partial(
            _rdb_kernel_pipelined, nf=nf, gc=gc, bh=bh, bw=bw, t_h=th,
            t_w=tw, plus=plus, neg_slope=neg_slope, acc_dtype=acc_dtype,
            nby=nby, nbx=nbx, total=b * nby * nbx, has_res=has_res,
            col_off=col_off, out_ro=out_ro, out_co=out_co,
        )
        nslots = 2
    else:
        kernel = functools.partial(
            _rdb_kernel, nf=nf, gc=gc, bh=bh, bw=bw, t_h=th, t_w=tw,
            plus=plus, neg_slope=neg_slope, acc_dtype=acc_dtype,
            has_res=has_res, col_off=col_off, out_ro=out_ro, out_co=out_co,
        )
        nslots = 0
    if nslots:
        scratch = [
            pltpu.VMEM((nslots, hp, wp, LANE), xp.dtype),
            pltpu.VMEM((nslots, bh, bw, LANE), xp.dtype),
        ]
        if has_res:
            scratch.append(pltpu.VMEM((nslots, bh, bw, LANE), xp.dtype))
        scratch += [pltpu.SemaphoreType.DMA((nslots,))] * (3 if has_res else 2)
    else:
        scratch = [
            pltpu.VMEM((hp, wp, LANE), xp.dtype),
            pltpu.VMEM((bh, bw, LANE), xp.dtype),
        ]
        if has_res:
            scratch.append(pltpu.VMEM((bh, bw, LANE), xp.dtype))
        scratch += [pltpu.SemaphoreType.DMA] * (3 if has_res else 2)
    in_specs = [
        # pin to HBM: ANY lets the compiler pull the whole padded image
        # into VMEM, which overflows for realistic tile batches
        pl.BlockSpec(memory_space=pltpu.HBM),   # xp: manual DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wt0
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w1x1
    ]
    operands = [xp, wt[0], wt[1], wt[2], wt[3], wt[4], bias_vec, w1]
    if has_res:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # res: manual DMA
        operands.append(res)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # donated out buffer
    operands.append(out_buf)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        # This backend stack-allocates pallas outputs in VMEM regardless of
        # out_specs; aliasing the output to a donated HBM input keeps the
        # full result in HBM.  Blocks are DMA'd out manually with 128-lane
        # padding for alignment.
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(out_buf.shape, xp.dtype),
        input_output_aliases={len(operands) - 1: 0},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the backend's default VMEM budget is far below the chip's
            # physical VMEM; without this, outputs+values "OOM" spuriously.
            # Env-tunable for block-size sweeps (tools/strip_height_ab.py).
            vmem_limit_bytes=int(os.environ.get("INNFER_VMEM_MB", "100"))
            * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def fused_rdb_padded(
    xp: jax.Array,
    weights: List[jax.Array],
    biases: List[jax.Array],
    out_buf: jax.Array,
    *,
    nf: int,
    gc: int = 32,
    res: Optional[jax.Array] = None,
    plus: bool = False,
    conv1x1_w: Optional[jax.Array] = None,
    block: Optional[Tuple[int, int]] = None,
    acc_dtype=jnp.float32,
    neg_slope: float = 0.2,
    interpret: bool = False,
    pipelined: bool = True,
) -> jax.Array:
    """One fused RDB on a PERSISTENT padded-layout activation (chain mode).

    ``xp``: (B, th + 2*HALO, tw + 2*COL_MARGIN, LANE) with tile content at
    [HALO:HALO+th, COL_MARGIN:COL_MARGIN+tw, :nf] and ZERO everywhere else
    (margins, right slack, lanes nf:LANE).  ``out_buf``: a dead same-shape
    buffer with zero margins — it is DONATED (input_output_aliases) and its
    interior fully overwritten, so the zero-margin invariant is preserved
    by induction and NO jnp.pad / output slice happens between chained RDB
    calls (the per-call pad+slice glue costs ~0.5 GB of HBM traffic per
    call at headline group sizes — the motivation for this mode).

    ``res``: optional padded-layout residual; when given the written
    interior is rdb(xp)*0.2 + res (the RRDB residual fused into the last
    per-RRDB call).  Returns the padded-layout output (alias of out_buf).
    """
    b = xp.shape[0]
    th = xp.shape[1] - 2 * HALO
    tw = xp.shape[2] - 2 * COL_MARGIN
    assert xp.shape[3] == LANE, "chain mode requires 128-lane activations"
    assert out_buf.shape == xp.shape, "out_buf must match the padded layout"
    if block is None:
        block = _auto_block(th, tw)
    bh, bw = _pick_block(th, block[0]), _pick_block(tw, block[1])
    wp = bw + 2 * HALO + W_SLACK
    assert wp % 16 == 0, (
        f"canvas width {wp} must be a 16-row tile multiple (pick bw in 16s)"
    )
    wt, bias_vec, w1 = _prep_params(
        weights, biases, nf=nf, gc=gc, plus=plus, conv1x1_w=conv1x1_w,
        dtype=xp.dtype)
    has_res = res is not None
    if res is None:
        res = jnp.zeros((1, 1, 1, LANE), xp.dtype)
    return _call_rdb(
        xp, wt, bias_vec, w1, res, out_buf, nf=nf, gc=gc, bh=bh, bw=bw,
        th=th, tw=tw, plus=plus, neg_slope=neg_slope, acc_dtype=acc_dtype,
        interpret=interpret, pipelined=pipelined, padded_io=True,
        has_res=has_res,
    )


def fused_rrdb_trunk(
    x: jax.Array,
    weights,  # [nb][nr][5] HWIO conv weights
    biases,   # [nb][nr][5] bias vectors
    *,
    nb: int,
    nr: int = 3,
    gc: int = 32,
    plus: bool = False,
    conv1x1_ws=None,  # [nb][nr] 1x1 weights (ESRGAN+) or None
    block: Optional[Tuple[int, int]] = None,
    neg_slope: float = 0.2,
    interpret: bool = False,
    pipelined: bool = True,
) -> jax.Array:
    """The whole nb x RRDB trunk as a padded-persistent chain of fused RDB
    calls (reference RRDBNet_arch.py:27-43,64-98: nb RRDBs, each
    nr RDBs + out*0.2 + x).

    Pads ONCE into the chain layout, rotates dead zero-margined buffers
    through all nb*nr pallas calls (donation keeps everything in two
    auxiliary buffers), fuses each RRDB's 0.2-residual into its last RDB
    call as an extra block-window DMA, and slices the content back out
    once at the end.  Eliminates the per-call pad/slice HBM glue of
    calling :func:`fused_rdb` in a loop.
    """
    b, th, tw, nf = x.shape
    xp = jnp.pad(
        x, [(0, 0), (HALO, HALO), (COL_MARGIN, COL_MARGIN), (0, LANE - nf)])
    pool = [jnp.zeros_like(xp), jnp.zeros_like(xp)]

    def w1_of(r, c):
        if not plus or conv1x1_ws is None:
            return None
        return conv1x1_ws[r][c]

    for r in range(nb):
        z = xp
        for c in range(nr):
            last = c == nr - 1
            out_buf = pool.pop(0)
            znew = fused_rdb_padded(
                z, weights[r][c], biases[r][c], out_buf, nf=nf, gc=gc,
                res=xp if last else None, plus=plus,
                conv1x1_w=w1_of(r, c), block=block, neg_slope=neg_slope,
                interpret=interpret, pipelined=pipelined)
            if c > 0:
                pool.append(z)  # intermediate activation: dead now
            z = znew
        pool.append(xp)  # rrdb input: dead once its residual is consumed
        xp = z
    return xp[:, HALO: HALO + th, COL_MARGIN: COL_MARGIN + tw, :nf]
