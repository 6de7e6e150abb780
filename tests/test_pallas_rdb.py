"""Fused Pallas RDB kernel vs the XLA reference path (interpret mode).

The kernel must be bit-faithful to the unfused conv chain in fp32 (same
fp32 accumulation order per conv; scatter-wide regrouping is exact in
exact arithmetic and agrees to ~1e-7 in fp32).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from innfer_tpu.ops.pallas.rdb import fused_rdb


def _make_rdb(rng, nf, gc):
    ws, bs = [], []
    for c in range(1, 6):
        cin = nf + (c - 1) * gc
        cout = gc if c < 5 else nf
        ws.append(jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32) / np.sqrt(cin * 9)))
        bs.append(jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.02))
    return ws, bs


def _xla_rdb(x, ws, bs, plus=False, w1=None):
    conv = lambda t, w, b: lax.conv_general_dilated(
        t, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    lr = lambda t: jnp.where(t >= 0, t, 0.2 * t)
    cat = lambda *ts: jnp.concatenate(ts, -1)
    x1 = lr(conv(x, ws[0], bs[0]))
    x2 = lr(conv(cat(x, x1), ws[1], bs[1]))
    if plus:
        x2 = x2 + lax.conv_general_dilated(
            x, w1, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x3 = lr(conv(cat(x, x1, x2), ws[2], bs[2]))
    x4 = lr(conv(cat(x, x1, x2, x3), ws[3], bs[3]))
    if plus:
        x4 = x4 + x2
    x5 = conv(cat(x, x1, x2, x3, x4), ws[4], bs[4])
    return x5 * 0.2 + x


@pytest.mark.parametrize("nf,gc,t,block", [
    (64, 32, 32, (16, 16)),
    (64, 32, 64, (32, 16)),   # multi-block grid in both dims
    (32, 16, 32, (16, 16)),   # esrgan-lite widths
])
def test_fused_rdb_matches_xla(rng, nf, gc, t, block):
    ws, bs = _make_rdb(rng, nf, gc)
    x = jnp.asarray(rng.standard_normal((2, t, t, nf)).astype(np.float32))
    ref = _xla_rdb(x, ws, bs)
    out = fused_rdb(x, ws, bs, gc=gc, block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=3e-6)


@pytest.mark.parametrize("th,tw,block", [
    (48, 32, (16, 16)),    # rectangular tile, multi-block grid
    (32, 64, (32, 32)),    # per-dim block clamp (bh=32 fits, bw=32 divides)
    (96, 32, (64, 16)),    # th <= 128 and 64 does not divide: bh = th = 96
    (192, 32, (128, 16)),  # th > 128, 128 does not divide: divisor loop -> 64
])
def test_fused_rdb_rect_tiles(rng, th, tw, block):
    nf, gc = 32, 16
    ws, bs = _make_rdb(rng, nf, gc)
    x = jnp.asarray(rng.standard_normal((2, th, tw, nf)).astype(np.float32))
    ref = _xla_rdb(x, ws, bs)
    out = fused_rdb(x, ws, bs, gc=gc, block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=3e-6)


def test_fused_rdb_plus(rng):
    nf, gc = 64, 32
    ws, bs = _make_rdb(rng, nf, gc)
    w1 = jnp.asarray(rng.standard_normal((1, 1, nf, gc)).astype(np.float32) / 8)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, nf)).astype(np.float32))
    ref = _xla_rdb(x, ws, bs, plus=True, w1=w1)
    out = fused_rdb(x, ws, bs, gc=gc, plus=True, conv1x1_w=w1, block=(16, 16),
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=3e-6)


def test_fused_rdb_bf16_close(rng):
    nf, gc = 64, 32
    ws, bs = _make_rdb(rng, nf, gc)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, nf)).astype(np.float32))
    ref = _xla_rdb(x, ws, bs)
    out = fused_rdb(x.astype(jnp.bfloat16),
                    [w.astype(jnp.bfloat16) for w in ws], bs,
                    gc=gc, block=(16, 16), interpret=True)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    assert err < 0.05, err  # bf16 resolution over a 5-conv chain


def test_pallas_backend_gate(rng):
    """backend='pallas' must reject unsupported configs loudly."""
    from innfer_tpu.models.rrdb import _rrdb

    x = jnp.zeros((1, 24, 24, 8), jnp.float32)  # not a 16-multiple
    with pytest.raises(ValueError):
        _rrdb({}, x, "p", nr=3, act_type="leakyrelu", plus=False,
              backend="pallas")


def test_tail_canon_modes_agree(rng, monkeypatch):
    """TAIL_CANON='none' (production) and 'axis0' (fallback) are the same
    math; pin bit-equality so the fallback stays usable if a Mosaic
    regression ever forces it back on (tools/out/tail_canon_ab.json)."""
    import innfer_tpu.ops.pallas.rdb as R
    ws, bs = _make_rdb(rng, 64, 32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 64)).astype(np.float32))
    outs = {}
    for mode in ("none", "axis0"):
        monkeypatch.setattr(R, "TAIL_CANON", mode)
        outs[mode] = np.asarray(
            R.fused_rdb(x, ws, bs, gc=32, block=(16, 16), interpret=True))
    np.testing.assert_array_equal(outs["none"], outs["axis0"])


def test_dx_slice_and_wide_tail_exact(rng, monkeypatch):
    """The DX_MODE='slice' (+-1 shifts as native-dtype slice+concat) and
    TAIL_WIDE_BF16 (full-width act, cast, then slice) hooks are exact-math
    reformulations: every combination must match the base kernel bitwise
    in interpret mode (ops/pallas/rdb.py DX_MODE / TAIL_WIDE_BF16)."""
    import innfer_tpu.ops.pallas.rdb as R

    ws, bs = _make_rdb(rng, 64, 32)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 64)).astype(np.float32))
    base = np.asarray(R.fused_rdb(x, ws, bs, gc=32, block=(16, 16),
                                  interpret=True))
    for dx, wide in [("slice", False), ("roll", True), ("slice", True)]:
        monkeypatch.setattr(R, "DX_MODE", dx)
        monkeypatch.setattr(R, "TAIL_WIDE_BF16", wide)
        out = np.asarray(R.fused_rdb(x, ws, bs, gc=32, block=(16, 16),
                                     interpret=True))
        np.testing.assert_array_equal(out, base, err_msg=f"{dx} wide={wide}")


def _xla_rrdb_trunk(x, tws, tbs, nb, nr):
    out = x
    for r in range(nb):
        z = out
        for c in range(nr):
            z = _xla_rdb(z, tws[r][c], tbs[r][c])
        out = z * 0.2 + out
    return out


def test_fused_rrdb_trunk_matches_xla(rng):
    """Chain mode (padded-persistent layout, donated buffers, fused RRDB
    residual) vs the unfused XLA trunk: same math to fp32 tolerance.
    Covers the zero-margin invariant across nb*nr donated calls and the
    COL_MARGIN=8 layout (ops/pallas/rdb.py fused_rrdb_trunk)."""
    from innfer_tpu.ops.pallas.rdb import fused_rrdb_trunk
    nb, nr = 2, 3
    tws, tbs = [], []
    for _ in range(nb):
        row_w, row_b = [], []
        for _ in range(nr):
            ws, bs = _make_rdb(rng, 64, 32)
            row_w.append(ws)
            row_b.append(bs)
        tws.append(row_w)
        tbs.append(row_b)
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 64)).astype(np.float32))
    ref = _xla_rrdb_trunk(x, tws, tbs, nb, nr)
    out = fused_rrdb_trunk(x, tws, tbs, nb=nb, nr=nr, gc=32,
                           block=(16, 16), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_rrdb_trunk_plus(rng):
    """ESRGAN+ cross-residuals through the chain (conv1x1 + x2-into-x4
    happen inside each fused call; RRDB residual still fused)."""
    from innfer_tpu.ops.pallas.rdb import fused_rrdb_trunk
    nb, nr = 1, 3
    tws, tbs, w1s = [], [], []
    row_w, row_b, row_1 = [], [], []
    for _ in range(nr):
        ws, bs = _make_rdb(rng, 64, 32)
        row_w.append(ws)
        row_b.append(bs)
        row_1.append(jnp.asarray(
            rng.standard_normal((64, 32)).astype(np.float32) * 0.1))
    tws.append(row_w)
    tbs.append(row_b)
    w1s.append(row_1)

    def xla_plus_rdb(x, ws, bs, w1):
        return _xla_rdb(x, ws, bs, plus=True, w1=w1.reshape(1, 1, 64, 32))

    z = x = jnp.asarray(
        rng.standard_normal((1, 32, 32, 64)).astype(np.float32))
    for c in range(nr):
        z = xla_plus_rdb(z, tws[0][c], tbs[0][c], w1s[0][c])
    ref = z * 0.2 + x
    out = fused_rrdb_trunk(x, tws, tbs, nb=nb, nr=nr, gc=32, plus=True,
                           conv1x1_ws=w1s, block=(16, 16), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_model_chain_integration(rng, monkeypatch):
    """The rrdb model forward routes the trunk through fused_rrdb_trunk
    when the fused gate fires (models/rrdb.py use_chain): verify the key
    collection / gc inference / residual wiring against the XLA forward
    by forcing the gate on CPU and interpret mode on the kernel."""
    import jax as _jax

    import innfer_tpu.models.rrdb as M
    import innfer_tpu.ops.pallas.rdb as R
    from tools import synth_params as SP

    base_model, params = SP.build("esrgan", scale=4, nb=2, nf=64)
    # backend='pallas' skips the bf16-only 'auto' condition so the gate
    # can fire on the CPU test backend (with default_backend patched)
    model_x = M.build({**base_model.cfg, "backend": "pallas"})
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    ref = base_model.apply(params, x)

    orig_trunk = R.fused_rrdb_trunk
    called = {}

    def interp_trunk(*a, **kw):
        called["yes"] = True
        kw["interpret"] = True
        return orig_trunk(*a, **kw)

    monkeypatch.setenv("INNFER_RDB_CHAIN", "1")
    monkeypatch.setattr(R, "fused_rrdb_trunk", interp_trunk)
    monkeypatch.setattr(_jax, "default_backend", lambda: "axon")
    out = model_x.apply(params, x)
    assert called.get("yes"), "chain gate did not fire"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_auto_block_wide_tiles(rng):
    """Wide tiles (whole-image hybrid trunk) pick the largest 16-mult
    block-width divisor <= the VMEM cap instead of falling to 64x64."""
    from innfer_tpu.ops.pallas.rdb import _auto_block, _wide_bw

    # wide-bw cap is 256 (MAX_WIDE_BW): bw=320 on a 1088x1920 trunk
    # needs 123.5M scoped VMEM (over the backend's 100M budget) and is
    # within window noise of bw=240 end-to-end (19.88 vs 19.77 MP/s, r4)
    assert _wide_bw(1920) == 240 and _wide_bw(1936) == 176
    assert _wide_bw(100) == 0  # no 16-mult divisor >= 64
    assert _auto_block(1088, 1920) == (64, 240)
    assert _auto_block(576, 576) == (64, 192)
    assert _auto_block(576, 256) == (64, 256)  # strip regime unchanged

    # exactness through the auto wide-block path (2 blocks of 32x176)
    nf, gc = 32, 16
    ws, bs = _make_rdb(rng, nf, gc)
    x = jnp.asarray(rng.standard_normal((1, 32, 352, nf)).astype(np.float32))
    ref = _xla_rdb(x, ws, bs)
    out = fused_rdb(x, ws, bs, gc=gc, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-6, rtol=3e-6)


def test_tile_pallas_fast_wide():
    from innfer_tpu.ops.pallas import tile_pallas_fast

    assert tile_pallas_fast(1088, 1920)       # hybrid whole-image dims
    assert not tile_pallas_fast(1080, 1920)   # rows not strip-divisible
    assert not tile_pallas_fast(1088, 1940)   # width not 16-mult


class TestLeverProbes:
    """Persistent compile-probe verdicts for Mosaic-blocked levers
    (ops/pallas/levers.py): cache round-trip, default gating, env wins."""

    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        from innfer_tpu.ops.pallas import levers as L

        monkeypatch.setattr(L, "_CACHE_PATH", str(tmp_path / "lp.json"))
        monkeypatch.setattr(L, "_mem", None)
        assert not L.lever_enabled("dx_slice")
        L.record("dx_slice", True, "test")
        assert L.lever_enabled("dx_slice")
        # fresh load from disk
        monkeypatch.setattr(L, "_mem", None)
        assert L.lever_enabled("dx_slice")
        # verdicts are keyed by jax version+backend: a different key misses
        import json as _json

        raw = _json.loads((tmp_path / "lp.json").read_text())
        assert all("|" in k for k in raw)

    def test_auto_block_96_gated_on_lever(self, monkeypatch):
        from innfer_tpu.ops.pallas import levers as L
        from innfer_tpu.ops.pallas import rdb as R

        monkeypatch.setattr(L, "lever_enabled", lambda n: False)
        assert R._auto_block(96, 128)[0] in (48, 32)  # 96 % 64 != 0
        monkeypatch.setattr(L, "lever_enabled", lambda n: n == "strip96")
        assert R._auto_block(96, 128) == (96, 128)

    def test_dx_mode_env_beats_cache(self, monkeypatch):
        from innfer_tpu.ops.pallas import levers as L
        from innfer_tpu.ops.pallas import rdb as R

        monkeypatch.setattr(L, "lever_enabled", lambda n: True)
        monkeypatch.setenv("INNFER_DX_MODE", "roll")
        assert R._default_dx_mode() == "roll"
        monkeypatch.delenv("INNFER_DX_MODE")
        assert R._default_dx_mode() == "slice"

    def test_dx_mode_resolves_lazily(self, monkeypatch):
        """DX_MODE must stay None at import (resolving consults the lever
        cache, whose key includes jax.default_backend() — an import-time
        backend init would hang on a downed tunnel and pin the platform
        before a CPU-forcing script's jax.config.update).  A direct
        setattr (tests/tools) always wins over the lazy default."""
        import subprocess
        import sys

        from innfer_tpu.ops.pallas import levers as L
        from innfer_tpu.ops.pallas import rdb as R

        monkeypatch.setattr(R, "DX_MODE", None)
        monkeypatch.setattr(L, "lever_enabled", lambda n: False)
        monkeypatch.delenv("INNFER_DX_MODE", raising=False)
        assert R._dx_mode() == "roll"
        assert R.DX_MODE == "roll"  # cached after first resolution
        monkeypatch.setattr(R, "DX_MODE", "slice")
        assert R._dx_mode() == "slice"
        # fresh interpreter: importing the module must not resolve it
        code = ("import innfer_tpu.ops.pallas.rdb as R; "
                "assert R.DX_MODE is None")
        import os.path as osp

        repo = osp.dirname(osp.dirname(osp.dirname(osp.dirname(
            osp.abspath(R.__file__)))))
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=120, cwd=repo)

    def test_probe_records_failure_on_exception(self, tmp_path, monkeypatch):
        from innfer_tpu.ops.pallas import levers as L
        from innfer_tpu.ops.pallas import rdb as R

        monkeypatch.setattr(L, "_CACHE_PATH", str(tmp_path / "lp.json"))
        monkeypatch.setattr(L, "_mem", None)

        def boom(*a, **k):
            raise RuntimeError("HTTP 500 mosaic")

        monkeypatch.setattr(R, "fused_rdb", boom)
        assert L._probe_dx_slice() is False
        assert not L.lever_enabled("dx_slice")
        note = L._load()[L._key("dx_slice")]["note"]
        assert "HTTP 500" in note
