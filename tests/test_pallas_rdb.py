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


@pytest.mark.parametrize("nf,gc,t,block,band", [
    (64, 32, 32, (16, 16), 8),
    (64, 32, 64, (32, 32), 16),
])
def test_banded_matches_xla(rng, nf, gc, t, block, band):
    from innfer_tpu.ops.pallas.contrib.rdb_banded import fused_rdb_banded

    ws, bs = _make_rdb(rng, nf, gc)
    x = jnp.asarray(rng.standard_normal((2, t, t, nf)).astype(np.float32))
    ref = _xla_rdb(x, ws, bs)
    out = fused_rdb_banded(x, ws, bs, gc=gc, block=block, band=band,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=3e-6)


def test_banded_rejects_indivisible(rng):
    from innfer_tpu.ops.pallas.contrib.rdb_banded import fused_rdb_banded

    ws, bs = _make_rdb(rng, 64, 32)
    # 250 > the largest block and not divisible by any block divisor
    x = jnp.zeros((1, 250, 250, 64), jnp.float32)
    with pytest.raises(ValueError):
        fused_rdb_banded(x, ws, bs, interpret=True)


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


def test_src0_pack9_exact(rng, monkeypatch):
    """The wide-source 9-tap K-pack (SRC0_PACK9) is a re-association of
    the same taps; must match the trio form to fp32 tolerance."""
    import innfer_tpu.ops.pallas.rdb as R
    ws, bs = _make_rdb(rng, 64, 32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 64)).astype(np.float32))
    base = np.asarray(R.fused_rdb(x, ws, bs, gc=32, block=(16, 16), interpret=True))
    monkeypatch.setattr(R, "SRC0_PACK9", True)
    packed = np.asarray(R.fused_rdb(x, ws, bs, gc=32, block=(16, 16), interpret=True))
    np.testing.assert_allclose(packed, base, atol=3e-6, rtol=3e-6)
