"""Fused PPON ResBlock_32 kernel vs the XLA reference path (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from innfer_tpu.ops.pallas.contrib.resblock32 import fused_resblock32


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _make(rng, nf, gc):
    # real PPON ratios (PPON_arch.py:78-91): c1 nf->nf, d_r nf->gc=nf/2
    c1_w = jnp.asarray(rng.standard_normal((3, 3, nf, nf)).astype(np.float32)
                       / np.sqrt(9 * nf))
    c1_b = jnp.asarray(rng.standard_normal(nf).astype(np.float32) * 0.02)
    d_ws = [jnp.asarray(rng.standard_normal((3, 3, nf, gc)).astype(np.float32)
                        / np.sqrt(9 * nf)) for _ in range(8)]
    d_bs = [jnp.asarray(rng.standard_normal(gc).astype(np.float32) * 0.02)
            for _ in range(8)]
    c2_w = jnp.asarray(rng.standard_normal((1, 1, 8 * gc, nf)).astype(np.float32)
                       / np.sqrt(8 * gc))
    c2_b = jnp.asarray(rng.standard_normal(nf).astype(np.float32) * 0.02)
    return c1_w, c1_b, d_ws, d_bs, c2_w, c2_b


def _xla_resblock(x, c1_w, c1_b, d_ws, d_bs, c2_w, c2_b):
    lr = lambda t: jnp.where(t >= 0, t, 0.2 * t)
    conv = lambda t, w, b, p, d: lax.conv_general_dilated(
        t, w, (1, 1), [(p, p), (p, p)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    h = lr(conv(x, c1_w, c1_b, 1, 1))
    ds = [conv(h, d_ws[r - 1], d_bs[r - 1], r, r) for r in range(1, 9)]
    sums, acc = [ds[0]], ds[0]
    for d in ds[1:]:
        acc = acc + d
        sums.append(acc)
    combine = jnp.concatenate(sums, axis=-1)
    out2 = conv(lr(combine), c2_w, c2_b, 0, 1)
    return x + 0.2 * out2


@pytest.mark.parametrize("nf,gc,th,tw,block", [
    (16, 8, 32, 32, (32, 32)),    # single block
    (16, 8, 48, 32, (16, 16)),    # rectangular multi-block grid
])
def test_fused_resblock_matches_xla(rng, nf, gc, th, tw, block):
    p = _make(rng, nf, gc)
    x = jnp.asarray(rng.standard_normal((2, th, tw, nf)).astype(np.float32))
    ref = _xla_resblock(x, *p)
    out = fused_resblock32(x, p[0], p[1], p[2], p[3], p[4], p[5],
                           block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=5e-6)


def test_ppon_backend_pallas_plumbing(rng, monkeypatch):
    """cfg backend='pallas' routes PPON ResBlocks through the fused kernel
    (forced interpret here so the CPU test exercises the same code path)."""
    import innfer_tpu.ops.pallas.contrib.resblock32 as RB
    from innfer_tpu.models.ppon import _res_block_32

    nf, gc = 16, 8
    p = {}
    pre = "B"
    c1_w, c1_b, d_ws, d_bs, c2_w, c2_b = _make(rng, nf, gc)
    p[f"{pre}.c1.weight"], p[f"{pre}.c1.bias"] = c1_w, c1_b
    for r in range(1, 9):
        p[f"{pre}.d{r}.weight"] = d_ws[r - 1]
        p[f"{pre}.d{r}.bias"] = d_bs[r - 1]
    p[f"{pre}.c2.weight"], p[f"{pre}.c2.bias"] = c2_w, c2_b
    x = jnp.asarray(rng.standard_normal((1, 32, 32, nf)).astype(np.float32))

    orig = RB.fused_resblock32
    monkeypatch.setattr(
        RB, "fused_resblock32",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    out_fused = _res_block_32(p, x, pre, backend="pallas")
    out_xla = _res_block_32(p, x, pre, backend="auto")
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               atol=5e-6, rtol=5e-6)

    # the gate must reject unsupported dims loudly, not inside Mosaic
    bad = jnp.zeros((1, 72, 72, nf), jnp.float32)
    with pytest.raises(ValueError, match="pallas"):
        _res_block_32(p, bad, pre, backend="pallas")


def test_fused_resblock_bf16_close(rng):
    nf, gc = 16, 8
    p = _make(rng, nf, gc)
    xf = jnp.asarray(rng.standard_normal((1, 32, 32, nf)).astype(np.float32))
    ref = np.asarray(_xla_resblock(xf, *p))
    out = fused_resblock32(xf.astype(jnp.bfloat16), p[0], p[1], p[2], p[3],
                           p[4], p[5], block=(32, 32), interpret=True)
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    assert err < 0.1, err  # bf16 rounding class
