"""Tiled inference engine tests.

Invariants (SURVEY.md §4):
  * identity blend: recompose(extract(x)) == x exactly (any grid)
  * reference mode reproduces the torch chop_forward output bit-near
  * tiled output ~= whole-image output away from seams
  * sharded (8-device CPU mesh) == single-device
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
from innfer_tpu.loader import load_model_from_state
from innfer_tpu.tiling.engine import (
    TiledRunner, extract_tiles, pad_image, recompose_tiles, tiled_apply,
)
from innfer_tpu.tiling.plan import (make_auto_plan, make_reference_plan,
                                    make_uniform_plan)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def psnr(a, b, peak=None):
    if peak is None:
        peak = max(1.0, float(np.abs(b).max()))
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(peak ** 2 / mse)


@pytest.mark.parametrize("hw,mode", [
    ((48, 48), "uniform"), ((50, 67), "uniform"), ((13, 21), "uniform"),
    ((40, 40), "reference"), ((48, 64), "reference"),
])
def test_identity_roundtrip(rng, hw, mode):
    """extract -> weight -> scatter -> normalize must reconstruct exactly."""
    h, w = hw
    x = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
    if mode == "uniform":
        plan = make_uniform_plan(h, w, 1, tile=16, overlap=4)
    else:
        plan = make_reference_plan(h, w, 1, patch=16, step=0.5)
    tiles = extract_tiles(pad_image(x, plan), plan)
    out = recompose_tiles(tiles, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5, rtol=1e-5)


class TestAutoPlan:
    def test_identity_roundtrip_rect_tiles(self, rng):
        """Auto plans may pick rectangular tiles; recompose must still be
        an exact inverse of extract."""
        h, w = 70, 120
        x = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
        plan = make_auto_plan(h, w, 1, overlap=4, tile_batch=4,
                              max_group_px=4 * 24 * 40, min_tile=16)
        assert plan.n_tiles > 1  # the cap forces a real grid
        tiles = extract_tiles(pad_image(x, plan), plan)
        out = recompose_tiles(tiles, plan)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-5, rtol=1e-5)

    def test_grid_fit_1080p(self):
        """The flagship shape must fit with low waste: no dead batch slots
        and <6%% pad+overlap overhead vs the fixed uniform grid's ~27%%."""
        plan = make_auto_plan(1080, 1920, 4, overlap=16, tile_batch=8)
        assert plan.n_tiles % min(8, plan.n_tiles) == 0
        slot_px = plan.n_tiles * plan.tile_h * plan.tile_w
        assert slot_px <= 1.15 * 1080 * 1920, slot_px
        # every dispatch group stays under the measured throughput knee
        assert 8 * plan.tile_h * plan.tile_w <= 1_400_000

    def test_small_image_whole(self):
        plan = make_auto_plan(100, 64, 2, overlap=16, tile_batch=8)
        assert plan.n_tiles == 1
        assert plan.pad_h >= 100 and plan.pad_w >= 64

    def test_tile_quantum_align(self):
        """align=64 (ModelDef.tile_quantum for the fused Pallas RDB) makes
        both tile dims 64-multiples on big images and falls back per-axis
        on images shorter than the quantum (reflect-pad safety)."""
        plan = make_auto_plan(1080, 1920, 4, overlap=16, align=64)
        assert plan.tile_h % 64 == 0 and plan.tile_w % 64 == 0
        small = make_auto_plan(40, 200, 2, overlap=8, align=64)
        # short H axis falls back to fine alignment; pads stay < image dims
        assert small.pad_h - 40 < 40 and small.pad_w - 200 < 200

    def test_quantum_plumbed_from_model(self, monkeypatch):
        """Synthetic ESRGAN declares tile_quantum=64 and TiledRunner passes
        it to the auto planner — but only in the regime where the fused
        kernel can fire (bf16 on the TPU backend); fp32/CPU runs keep the
        fine grid."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools import synth_params as SP

        model, _params = SP.build("esrgan", scale=4, nb=1, nf=16)
        assert model.tile_quantum == 64
        runner = TiledRunner(model.apply, model.scale, mode="auto",
                             compute_dtype=jnp.bfloat16,
                             tile_quantum=model.tile_quantum)
        # CPU backend: quantum must NOT be paid (kernel cannot fire)
        assert runner._effective_quantum() == 1
        assert runner.plan_for(1080, 1920).tile_h == 552
        # TPU backend + bf16: coarse grid
        monkeypatch.setattr(jax, "default_backend", lambda: "axon")
        plan = runner.plan_for(1080, 1920)
        assert plan.tile_h % 64 == 0 and plan.tile_w % 64 == 0
        # TPU backend + fp32: fine grid again
        runner_fp32 = TiledRunner(model.apply, model.scale, mode="auto",
                                  compute_dtype=jnp.float32,
                                  tile_quantum=model.tile_quantum)
        assert runner_fp32._effective_quantum() == 1

    def test_auto_runner_matches_whole(self, rng):
        """Auto-tiled model output ~= whole-image forward (seams inside
        overlap; same bar as the uniform mode test)."""
        fx = np.load(os.path.join(GOLDENS, "chop_esrgan_x2.npz"))
        meta = json.loads(str(fx["meta"]))
        state = load_checkpoint(os.path.join(GOLDENS, "chop_esrgan_x2.pth"))
        model, params = load_model_from_state(state, dict(meta["cfg"]))
        x = jnp.asarray(rng.standard_normal((1, 40, 56, 3), np.float32) * 0.2 + 0.5)
        whole = jax.jit(model.apply)(params, x)
        runner = TiledRunner(model.apply, model.scale, mode="auto",
                             overlap=8, tile_batch=4)
        # force a real grid through the runner's planner
        runner._plans[(40, 56, 1)] = make_auto_plan(
            40, 56, model.scale, overlap=8, tile_batch=4,
            max_group_px=4 * 24 * 32, min_tile=16)
        tiled = runner(params, x)
        assert tiled.shape == whole.shape
        p = psnr(np.asarray(tiled), np.asarray(whole))
        assert p >= 34, f"auto-tiled vs whole PSNR {p:.1f} dB"


def test_reference_mode_matches_torch_chop():
    fx = np.load(os.path.join(GOLDENS, "chop_esrgan_x2.npz"))
    meta = json.loads(str(fx["meta"]))
    state = load_checkpoint(os.path.join(GOLDENS, "chop_esrgan_x2.pth"))
    model, params = load_model_from_state(state, dict(meta["cfg"]))

    runner = TiledRunner(model.apply, model.scale, mode="reference",
                         patch=meta["patch"], step=meta["step"], tile_batch=4)
    x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
    out = np.transpose(np.asarray(runner(params, x)), (0, 3, 1, 2))
    p = psnr(out, fx["output"])
    assert p >= 80, f"reference-mode chop parity {p:.2f} dB"


def test_uniform_vs_whole_image():
    fx = np.load(os.path.join(GOLDENS, "chop_esrgan_x2.npz"))
    meta = json.loads(str(fx["meta"]))
    state = load_checkpoint(os.path.join(GOLDENS, "chop_esrgan_x2.pth"))
    model, params = load_model_from_state(state, dict(meta["cfg"]))

    runner = TiledRunner(model.apply, model.scale, mode="uniform", tile=16, overlap=8)
    x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))
    out = np.transpose(np.asarray(runner(params, x)), (0, 3, 1, 2))
    assert out.shape == fx["whole"].shape
    p = psnr(out, fx["whole"])
    # seam regression pin: measured 56.9 dB on this fixture (a blend-math
    # regression of even a few dB must fail; the old >=30 bar could not
    # catch one — VERDICT r1 weak #7)
    assert p >= 50, f"uniform tiling vs whole-image {p:.2f} dB (measured 56.9)"


def test_image_smaller_than_tile():
    fx = np.load(os.path.join(GOLDENS, "chop_esrgan_x2.npz"))
    meta = json.loads(str(fx["meta"]))
    state = load_checkpoint(os.path.join(GOLDENS, "chop_esrgan_x2.pth"))
    model, params = load_model_from_state(state, dict(meta["cfg"]))

    runner = TiledRunner(model.apply, model.scale, mode="uniform", tile=64, overlap=8)
    x = jnp.asarray(np.random.default_rng(3).random((1, 17, 23, 3), dtype=np.float32))
    out = runner(params, x)
    assert out.shape == (1, 34, 46, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_bucketing_shares_plans():
    runner = TiledRunner(lambda p, x: x, 1, mode="uniform", tile=32, overlap=8, bucket=64)
    p1 = runner.plan_for(70, 70)
    p2 = runner.plan_for(90, 90)
    assert (p1.pad_h, p1.pad_w) == (p2.pad_h, p2.pad_w)


def test_sharded_equals_single():
    fx = np.load(os.path.join(GOLDENS, "chop_esrgan_x2.npz"))
    meta = json.loads(str(fx["meta"]))
    state = load_checkpoint(os.path.join(GOLDENS, "chop_esrgan_x2.pth"))
    model, params = load_model_from_state(state, dict(meta["cfg"]))
    x = jnp.asarray(np.transpose(fx["input"], (0, 2, 3, 1)))

    single = TiledRunner(model.apply, model.scale, mode="uniform", tile=16, overlap=8,
                         tile_batch=8)
    out_single = np.asarray(single(params, x))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharded = TiledRunner(model.apply, model.scale, mode="uniform", tile=16, overlap=8,
                          tile_batch=8, mesh=mesh)
    out_sharded = np.asarray(sharded(params, x))
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5, rtol=1e-5)


def test_plan_rejects_bad_overlap():
    with pytest.raises(ValueError):
        make_uniform_plan(64, 64, 2, tile=16, overlap=16)
    with pytest.raises(ValueError):
        make_reference_plan(64, 64, 2, patch=16, step=0.3)


def test_tp_sharded_params_match_replicated():
    """Channel tensor parallelism (conv O-dim sharding) must be numerically
    transparent: XLA inserts the collectives, results match replicated."""
    from innfer_tpu.parallel.mesh import make_mesh, tp_shard_params

    state = load_checkpoint(os.path.join(GOLDENS, "chop_esrgan_x2.pth"))
    meta = json.loads(str(np.load(os.path.join(GOLDENS, "chop_esrgan_x2.npz"))["meta"]))
    model, params = load_model_from_state(state, dict(meta["cfg"]))
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 3), np.float32))
    ref = np.asarray(jax.jit(model.apply)(params, x))

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    tp = tp_shard_params(params, mesh)
    out = np.asarray(jax.jit(model.apply)(tp, x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_halo_conv_matches_unsharded(rng):
    """Row-sharded conv with ppermute halo exchange == plain conv."""
    from innfer_tpu.nn import functional as F
    from innfer_tpu.parallel.spatial import halo_conv2d

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    x = jnp.asarray(rng.standard_normal((2, 64, 24, 8), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    ref = F.conv2d(x, w, b, padding=1)
    out = jax.jit(
        lambda t: halo_conv2d(t, w, b, mesh=mesh, padding=1)
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


class TestStripAwarePlannerGuard:
    def test_540p_plans_kernel_eligible_tiles(self):
        """Round-3 regression: with the strip-aware gate and the 1.25 cost
        guard, the 540x960 bench shape must plan kernel-eligible tiles
        (it fell back to 280x256 XLA tiles under the old square-only gate,
        silently losing the fused trunk)."""
        from innfer_tpu.ops.pallas import tile_pallas_fast
        from innfer_tpu.tiling.plan import make_auto_plan

        for h, w in ((540, 960), (1080, 1920)):
            p = make_auto_plan(h, w, 4, overlap=16, tile_batch=8,
                               max_group_px=1_400_000, align=64)
            assert tile_pallas_fast(p.tile_h, p.tile_w), (h, w, p.tile_h, p.tile_w)

    def test_tile_pallas_fast_strip_shapes(self):
        from innfer_tpu.ops.pallas import tile_pallas_fast

        assert tile_pallas_fast(320, 256)   # strip 64x256
        assert tile_pallas_fast(576, 256)
        assert tile_pallas_fast(144, 256)   # strip 48x256
        assert not tile_pallas_fast(280, 256)  # 280 has no strip height
        assert not tile_pallas_fast(320, 250)  # width not 16-multiple
        # width beyond the strip VMEM cap still qualifies via 64x64 blocks
        assert tile_pallas_fast(320, 512)
        assert tile_pallas_fast(128, 128)   # square regime still fast


class TestScatterFreeGlue:
    """The production extract/recompose are pure static slices+concats
    (XLA TPU lowers gather/scatter poorly; see recompose_tiles_concat).
    Pin them bitwise against the scatter formulation and a numpy oracle."""

    @pytest.mark.parametrize("plan", [
        make_uniform_plan(100, 130, 2, tile=48, overlap=8),
        make_uniform_plan(40, 40, 1, tile=48, overlap=8),
        make_auto_plan(200, 330, 2, overlap=16, tile_batch=8, align=64),
        make_auto_plan(200, 333, 1, overlap=16, tile_batch=8),
        make_reference_plan(90, 130, 2),
        # 50% step + clamped edge tiles: >2-way coverage regions
        make_reference_plan(104, 104, 2),
    ], ids=["uniform2x", "uniform1t", "auto64", "auto1x", "ref", "ref_clamp"])
    def test_concat_matches_scatter(self, plan):
        from innfer_tpu.tiling.engine import (recompose_tiles_concat,
                                              recompose_tiles_scatter)

        rng = np.random.default_rng(0)
        tiles = jnp.asarray(rng.random(
            (plan.n_tiles, plan.tile_h * plan.scale,
             plan.tile_w * plan.scale, 3), np.float32))
        a = np.asarray(recompose_tiles_concat(tiles, plan))
        b = np.asarray(recompose_tiles_scatter(tiles, plan))
        assert np.array_equal(a, b)

    def test_extract_matches_numpy(self):
        plan = make_auto_plan(200, 330, 2, overlap=16, tile_batch=8)
        rng = np.random.default_rng(1)
        x = rng.random((1, plan.pad_h, plan.pad_w, 3)).astype(np.float32)
        got = np.asarray(extract_tiles(jnp.asarray(x), plan))
        k = 0
        for sh in plan.starts_h:
            for sw in plan.starts_w:
                ref = x[0, sh: sh + plan.tile_h, sw: sw + plan.tile_w]
                assert np.array_equal(got[k], ref), (sh, sw)
                k += 1

    def test_rect_uniform_plan_roundtrip(self):
        """tile_h/tile_w override makes strip grids expressible in uniform
        mode (e.g. the 1088x256 headline strip plan, tools/plan_ab.py)."""
        plan = make_uniform_plan(100, 70, 2, tile_h=96, tile_w=48, overlap=8)
        assert (plan.tile_h, plan.tile_w) == (96, 48)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 100, 70, 3), np.float32))
        t = extract_tiles(pad_image(x, plan), plan)
        up = jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        r = np.asarray(recompose_tiles(up, plan))
        ref = np.repeat(np.repeat(np.asarray(x), 2, axis=1), 2, axis=2)
        assert np.max(np.abs(r - ref)) < 1e-5

    def test_plan_chunk_overrides_engine_grouping(self):
        """A planner-chosen dispatch-group size (TilePlan.chunk) must win
        over the engine's min(tile_batch, n_tiles) default: the forward
        then sees chunk-sized batches."""
        import dataclasses

        from innfer_tpu.tiling.engine import tiled_apply

        plan = make_uniform_plan(100, 130, 2, tile=48, overlap=8)
        plan = dataclasses.replace(plan, chunk=2)
        seen = []

        def apply_fn(params, batch):
            seen.append(batch.shape[0])
            return jnp.repeat(jnp.repeat(batch, 2, axis=1), 2, axis=2)

        x = jnp.asarray(np.random.default_rng(0).random(
            (1, 100, 130, 3), np.float32))
        out = tiled_apply(apply_fn, None, x, plan, tile_batch=8)
        assert out.shape == (1, 200, 260, 3)
        assert seen and all(s == 2 for s in seen)


class TestHybrid:
    """Whole-image trunk + tiled tail (engine.hybrid_apply): the trunk is
    exact whole-image math; only tail-tile seams differ from the whole
    forward (blend-ramp-weighted tail halo), far better than fully tiled
    seams (~54 vs ~36 dB at default overlap)."""

    def _model(self):
        from tools import synth_params as SP

        return SP.build("esrgan", scale=4, dtype=jnp.float32, nb=1, nf=16)

    def test_hybrid_dims(self):
        from innfer_tpu.tiling.engine import hybrid_dims

        assert hybrid_dims(1080, 1920) == (1088, 1920)
        h, w = hybrid_dims(100, 130)
        assert h % 64 == 0 and w % 16 == 0 and h >= 100 and w >= 130

    def test_hybrid_close_to_whole(self):
        model, params = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 70, 90, 3), np.float32))
        whole = np.asarray(model.apply(params, x))
        r = TiledRunner(model.apply, 4, mode="hybrid", tile=(48, 48),
                        overlap=16, tile_batch=4,
                        trunk_fn=model.apply_trunk, tail_fn=model.apply_tail)
        out = np.asarray(r(params, x))
        assert out.shape == whole.shape
        assert psnr(out, whole) > 45

    def test_trunk_tail_split_is_apply(self):
        model, params = self._model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 40, 40, 3), np.float32))
        a = np.asarray(model.apply(params, x))
        b = np.asarray(model.apply_tail(
            params, model.apply_trunk(params, x)))
        assert np.array_equal(a, b)

    def test_hybrid_requires_split(self):
        with pytest.raises(ValueError, match="trunk/tail split"):
            TiledRunner(lambda p, x: x, 4, mode="hybrid")

    def test_hybrid_srresnet(self):
        from tools import synth_params as SP

        model, params = SP.build("srresnet", scale=4, dtype=jnp.float32,
                                 nb=2, nf=16)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((1, 70, 90, 3), np.float32))
        whole = np.asarray(model.apply(params, x))
        r = TiledRunner(model.apply, 4, mode="hybrid", tile=(48, 48),
                        overlap=16, tile_batch=4,
                        trunk_fn=model.apply_trunk, tail_fn=model.apply_tail)
        out = np.asarray(r(params, x))
        assert out.shape == whole.shape
        assert psnr(out, whole) > 45

    def test_hybrid_px_cap_falls_back_to_auto(self):
        model, params = self._model()
        r = TiledRunner(model.apply, 4, mode="hybrid", overlap=16,
                        tile_batch=8, trunk_fn=model.apply_trunk,
                        tail_fn=model.apply_tail, tile_quantum=64)
        # 33 MP input (8K): whole trunk would OOM the 16 GB HBM
        assert r._mode_for(4320, 7680) == "auto"
        assert r._mode_for(1080, 1920) == "hybrid"
        # beyond-cap plan is a real tile grid, not a whole-image cover
        r.HYBRID_PX_CAP = 100 * 130 - 1
        plan = r.plan_for(200, 260, run_dtype=jnp.float32)
        assert plan.n_tiles > 1 and plan.pad_h >= 200

    def test_hybrid_lean_tail_grid_default(self):
        # planner-owned (int-tile) hybrid grids use the minimal exact
        # overlap (2*tail_halo) and the lean row cover: 1088 trunk rows
        # -> 2 rows of 548 (processed ratio 1.0745 vs 576/ov16's 1.1294,
        # measured faster end-to-end, tools/out/hybrid_breakdown.json r4)
        model, params = self._model()
        r = TiledRunner(model.apply, 4, mode="hybrid", tile=256,
                        overlap=16, tile_batch=8,
                        trunk_fn=model.apply_trunk, tail_fn=model.apply_tail,
                        tail_halo=model.tail_halo)
        plan = r.plan_for(1080, 1920, run_dtype=jnp.float32)
        assert (plan.tile_h, plan.tile_w) == (548, 256)
        assert plan.starts_h == (0, 540)  # overlap exactly 2*tail_halo=8
        # the lean grid stays seam-exact vs the whole-image forward
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.random((1, 70, 90, 3), np.float32))
        whole = np.asarray(model.apply(params, x))
        out = np.asarray(r(params, x))
        assert psnr(out, whole) > 45

    def test_hybrid_clamps_overlap_to_tail_halo(self):
        # seam-exactness needs overlap >= 2*tail_halo (ADVICE r3): a tiny
        # --overlap must be clamped, not silently produce seam artifacts
        model, params = self._model()
        assert model.tail_halo > 0
        r = TiledRunner(model.apply, 4, mode="hybrid", tile=(48, 48),
                        overlap=1, tile_batch=4,
                        trunk_fn=model.apply_trunk, tail_fn=model.apply_tail,
                        tail_halo=model.tail_halo)
        plan = r.plan_for(70, 90, run_dtype=jnp.float32)
        if plan.n_tiles > 1:
            strides = [b - a for a, b in
                       zip(plan.starts_w, plan.starts_w[1:])]
            assert plan.tile_w - max(strides) >= 2 * model.tail_halo
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((1, 70, 90, 3), np.float32))
        whole = np.asarray(model.apply(params, x))
        out = np.asarray(r(params, x))
        assert psnr(out, whole) > 45

    def test_cover_plan_rejects_oversized_overlap(self):
        from innfer_tpu.tiling.plan import make_cover_plan

        with pytest.raises(ValueError, match="overlap"):
            make_cover_plan(100, 100, 4, tile_h=48, tile_w=48, overlap=48)

    def test_auto_upgrades_to_hybrid_when_eligible(self, monkeypatch):
        # on a bf16 TPU run, mode='auto' with a trunk/tail split and a
        # kernel-eligible whole-image shape self-upgrades to hybrid (the
        # measured-faster regime, round 4); CPU/fp32/mesh runs keep auto
        model, params = self._model()
        r = TiledRunner(model.apply, 4, mode="auto", overlap=16,
                        tile_batch=8, tile_quantum=64,
                        trunk_fn=model.apply_trunk, tail_fn=model.apply_tail,
                        tail_halo=model.tail_halo,
                        compute_dtype=jnp.bfloat16)
        import innfer_tpu.tiling.engine as eng

        monkeypatch.setattr(eng.jax, "default_backend", lambda: "tpu")
        assert r._mode_for(1080, 1920, jnp.bfloat16) == "hybrid"
        # over the px cap: stays auto
        assert r._mode_for(4320, 7680, jnp.bfloat16) == "auto"
        # fp32 (no kernel): stays auto
        r32 = TiledRunner(model.apply, 4, mode="auto", tile_quantum=64,
                          trunk_fn=model.apply_trunk,
                          tail_fn=model.apply_tail,
                          compute_dtype=jnp.float32)
        assert r32._mode_for(1080, 1920, jnp.float32) == "auto"
        # no trunk/tail split: stays auto
        rns = TiledRunner(model.apply, 4, mode="auto", tile_quantum=64,
                          compute_dtype=jnp.bfloat16)
        assert rns._mode_for(1080, 1920, jnp.bfloat16) == "auto"
        # CPU backend (the test default): stays auto
        monkeypatch.undo()
        assert r._mode_for(1080, 1920, jnp.bfloat16) == "auto"


class TestCrossImageTileStacking:
    """Cross-image tile stacking (engine.tiled_apply B>1): tiles from a
    stack of same-shape images share dispatch groups.  Parity contract is
    exact per-image equivalence with the B=1 path."""

    @staticmethod
    def _mixing_sr2(params, batch):
        # spatially-mixing 2x "model": catches tile-order / recompose bugs
        y = batch + 0.25 * jnp.roll(batch, 1, axis=1) \
            + 0.125 * jnp.roll(batch, -1, axis=2)
        return jnp.repeat(jnp.repeat(jnp.tanh(y), 2, axis=1), 2, axis=2)

    @pytest.mark.parametrize("mode,hw", [
        ("uniform", (48, 48)), ("uniform", (50, 67)), ("auto", (50, 67)),
    ])
    def test_batched_matches_per_image(self, mode, hw):
        h, w = hw
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.random((3, h, w, 3), np.float32))
        runner = TiledRunner(self._mixing_sr2, 2, mode=mode,
                             tile=32, overlap=8, tile_batch=4)
        batched = np.asarray(runner(None, xs))
        solo = np.concatenate(
            [np.asarray(runner(None, xs[i:i + 1])) for i in range(3)])
        assert batched.shape == (3, 2 * h, 2 * w, 3)
        np.testing.assert_allclose(batched, solo, rtol=0, atol=1e-6)

    def test_batched_output_index(self):
        # multi-output models (PPON) keep the output_index selection
        def multi(params, batch):
            up = jnp.repeat(jnp.repeat(batch, 2, 1), 2, 2)
            return up * 0.5, up, up * 2.0

        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.random((2, 40, 40, 3), np.float32))
        runner = TiledRunner(multi, 2, mode="uniform", tile=24, overlap=8,
                             output_index=2)
        batched = np.asarray(runner(None, xs))
        solo = np.asarray(runner(None, xs[:1]))
        np.testing.assert_allclose(batched[:1], solo, rtol=0, atol=1e-6)

    def test_batched_groups_fill_toward_cap(self):
        """The stacked run must use LARGER dispatch groups than B=1 (the
        amortization mechanism), bounded by max_group_px."""
        from innfer_tpu.tiling import engine as E

        seen = []
        orig = jax.lax.map

        def spy(f, xs):
            seen.append(xs.shape)
            return orig(f, xs)

        rng = np.random.default_rng(2)
        xs = jnp.asarray(rng.random((4, 48, 48, 3), np.float32))
        runner = TiledRunner(self._mixing_sr2, 2, mode="uniform",
                             tile=32, overlap=8, tile_batch=2)
        old = E.jax.lax.map
        E.jax.lax.map = spy
        try:
            runner(None, xs)          # batched: groups grow
            runner(None, xs[:1])      # solo: engine default chunk
        finally:
            E.jax.lax.map = old
        batched_chunk = seen[0][1]
        solo_chunk = seen[1][1]
        assert batched_chunk > solo_chunk
        # group pixel bound holds
        assert batched_chunk * 32 * 32 <= 1_400_000

    def test_batched_mesh_shards_groups(self):
        devs = jax.devices()[:4]
        mesh = Mesh(np.array(devs), ("data",))
        rng = np.random.default_rng(3)
        xs = jnp.asarray(rng.random((2, 48, 48, 3), np.float32))
        meshed = TiledRunner(self._mixing_sr2, 2, mode="uniform", tile=32,
                             overlap=8, tile_batch=4, mesh=mesh)
        plain = TiledRunner(self._mixing_sr2, 2, mode="uniform", tile=32,
                            overlap=8, tile_batch=4)
        np.testing.assert_allclose(np.asarray(meshed(None, xs)),
                                   np.asarray(plain(None, xs)),
                                   rtol=0, atol=1e-5)

    def test_hybrid_batched_loops_per_image(self):
        """Explicit hybrid mode with a stacked batch must fall back to the
        per-image hybrid path (same outputs as solo calls)."""
        def trunk(params, x):
            return x + 0.5 * jnp.roll(x, 1, axis=1)

        def tail(params, x):
            return jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)

        rng = np.random.default_rng(4)
        xs = jnp.asarray(rng.random((2, 40, 40, 3), np.float32))
        runner = TiledRunner(None, 2, mode="hybrid", tile=(24, 24),
                             overlap=8, trunk_fn=trunk, tail_fn=tail,
                             tail_halo=2)
        batched = np.asarray(runner(None, xs))
        solo = np.concatenate(
            [np.asarray(runner(None, xs[i:i + 1])) for i in range(2)])
        np.testing.assert_allclose(batched, solo, rtol=0, atol=1e-6)
