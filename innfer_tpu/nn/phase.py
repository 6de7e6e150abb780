"""Phase-space (deferred pixel-shuffle) convolution primitives.

The SR tails (reference RRDBNet_arch.py:40-48, SRResNet_arch.py:44-45)
end with: [last upsample block] -> act -> HR conv3x3 -> act -> conv_last,
running the two HR convs at FULL output resolution.  On TPU those convs
are the slowest ops per FLOP in the whole model: the spatial extent is
scale^2 larger while the channel count stays at nf (= 64 -> half the MXU
lane width in bf16), and the pixel-shuffle materializes scale^2-sized
activations twice.

This module computes the SAME math without ever materializing the HR
activations until the final 3-channel image.  A tensor at the r-times-
finer resolution is represented in *phase-major* form

    P[b, y, x, (a*r + c)*C + ch]  ==  HR[b, r*y + a, r*x + c, ch]

and a 3x3/pad-1 conv at HR resolution decomposes exactly into r^2 small
convs on P (one per output phase): the three HR taps around output row
r*y + a land on HR rows r*y + a + dy, i.e. phase (a+dy) mod r at grid
row y + floor((a+dy)/r) — a <=2-tap window per axis.  Tap placements are
unique per (cell, phase) pair, so the per-phase kernels are a pure
rearrangement of the original kernel (no tap summing): the decomposition
is exact up to fp32 accumulation order.

FLOP cost: the per-phase kernels carry structural zeros where a (cell,
phase) slot has no tap.  At r=2 the dense cost is 16/9 of the original
conv's, but every conv runs at 1/r^2 the spatial size with r^2-wider
input channels (256 for nf=64) — measured much faster end-to-end on TPU
than the HR-resolution form (see BASELINE.md).  r>=3 inflates by >=2.8x
and is not worth it; callers keep those scales on the materialized path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from innfer_tpu.nn import functional as F

Array = jax.Array


def _phase_windows(r: int):
    """Per output phase a: (cmin, cmax) grid-cell window covering the
    3 taps dy in {-1,0,1} -> cell floor((a+dy)/r)."""
    wins = []
    for a in range(r):
        cells = [(a + dy) // r for dy in (-1, 0, 1)]
        wins.append((min(cells), max(cells)))
    return wins


def _phase_sel(r: int) -> np.ndarray:
    """sel[a, p, k, d] = 1 iff tap d (dy = d-1) of output phase a reads
    input phase p at kernel cell k (cell index relative to the phase's
    window start)."""
    wins = _phase_windows(r)
    kmax = max(hi - lo + 1 for lo, hi in wins)
    sel = np.zeros((r, r, kmax, 3), np.float32)
    for a in range(r):
        lo, _hi = wins[a]
        for d, dy in enumerate((-1, 0, 1)):
            p = (a + dy) % r
            k = (a + dy) // r - lo
            sel[a, p, k, d] = 1.0
    return sel


def phase_kernels(w: Array, r: int = 2):
    """Per-output-phase kernels for a 3x3/pad-1 conv evaluated in phase
    space.

    w: (3, 3, cin, cout) HWIO.  Returns a list of r*r entries
    ((kh, kw, r*r*cin, cout) kernel, ((top, bot), (left, right)) pad) in
    output-phase-major order (a*r + c).  Input channels are phase-major.
    Pure placement (0/1 coefficients, disjoint slots): exact.
    """
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    sel = _phase_sel(r)
    wins = _phase_windows(r)
    wf = w.astype(jnp.float32)
    out = []
    for a in range(r):
        alo, ahi = wins[a]
        ka = ahi - alo + 1
        sa = jnp.asarray(sel[a, :, :ka, :])
        for c in range(r):
            clo, chi = wins[c]
            kc = chi - clo + 1
            sc = jnp.asarray(sel[c, :, :kc, :])
            # (p,k,d) x (q,l,e) x (d,e,i,o) -> (k,l,p,q,i,o); flatten
            # (p,q,i) phase-major to match the P channel layout
            kab = jnp.einsum("pkd,qle,deio->klpqio", sa, sc, wf,
                             precision=jax.lax.Precision.HIGHEST)
            kab = kab.reshape(ka, kc, r * r * cin, cout).astype(w.dtype)
            pad = ((-alo, ahi), (-clo, chi))
            out.append((kab, pad))
    return out


def phase_conv3x3(p: Array, w: Array, b: Optional[Array] = None,
                  r: int = 2) -> Array:
    """Exact phase-space evaluation of conv3x3(HR, w, b, padding=1).

    p: (B, Hg, Wg, r*r*cin) phase-major; returns (B, Hg, Wg, r*r*cout)
    phase-major.  HR zero padding maps bit-for-bit to grid zero padding
    (only taps that cross the HR border reach grid cells -1 / Hg).
    """
    outs = []
    for kab, pad in phase_kernels(w, r):
        outs.append(F.conv2d(p, kab, b, padding=list(pad)))
    return jnp.concatenate(outs, axis=-1)


def phase_conv3x3_dense(p: Array, w: Array, b: Optional[Array] = None,
                        r: int = 2) -> Array:
    """Same math as :func:`phase_conv3x3` but as ONE conv with a merged
    (3, 3, r*r*cin, r*r*cout) kernel (absolute cell indexing, zeros where
    a (cell, phase) slot carries no tap).  More structural zeros than the
    per-phase split (36 vs 16 tap-slots at r=2) but a single dispatch;
    kept for A/B measurement."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    sel = np.zeros((r, r, 3, 3), np.float32)  # (a, p, cell, tap)
    for a in range(r):
        for d, dy in enumerate((-1, 0, 1)):
            sel[a, (a + dy) % r, (a + dy) // r + 1, d] = 1.0
    s = jnp.asarray(sel)
    kd = jnp.einsum("apkd,cqle,deio->klpqiaco", s, s, w.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    kd = kd.reshape(3, 3, r * r * cin, r * r * cout).astype(w.dtype)
    return F.conv2d(p, kd, phase_bias(b, r), padding=1)


def phase_shuffle_out(p: Array, r: int = 2) -> Array:
    """Materialize a phase-major tensor to full resolution:
    (B, Hg, Wg, r*r*C) -> (B, r*Hg, r*Wg, C)."""
    bsz, hg, wg, pc = p.shape
    c = pc // (r * r)
    t = p.reshape(bsz, hg, wg, r, r, c)
    t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(bsz, hg * r, wg * r, c)


def cmajor_to_phase_major(w: Array, r: int = 2) -> Array:
    """Reorder a conv kernel's OUTPUT channels from PixelShuffle c-major
    order (o*r^2 + a*r + c, torch PixelShuffle semantics) to the
    phase-major order this module uses ((a*r + c)*cout + o).  Static
    kernel permutation: exact."""
    kh, kw, cin, n = w.shape
    cout = n // (r * r)
    t = w.reshape(kh, kw, cin, cout, r * r)
    return t.transpose(0, 1, 2, 4, 3).reshape(kh, kw, cin, n)


def phase_bias(b: Optional[Array], r: int = 2) -> Optional[Array]:
    """Per-channel bias replicated across phases (phase-major layout)."""
    if b is None:
        return None
    return jnp.tile(b, r * r)


def cmajor_bias_to_phase_major(b: Optional[Array], r: int = 2):
    """Reorder an r^2*cout bias vector from PixelShuffle c-major order to
    phase-major (for pixelshuffle-mode upsample convs whose checkpoint
    bias is already per-(channel, phase))."""
    if b is None:
        return None
    n = b.shape[0]
    return b.reshape(n // (r * r), r * r).T.reshape(-1)
