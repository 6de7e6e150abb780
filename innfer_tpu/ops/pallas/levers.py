"""Persistent compile-probe verdicts for Mosaic-blocked performance levers.

Two measured/projected ~+10% kernel levers are blocked by remote Mosaic
compiler failures on the current backend (VERDICT r4 #3):

  * ``dx_slice`` — the +-1 horizontal-tap shifts as native-dtype slice +
    zero-concat instead of f32 dynamic rotates (rdb.DX_MODE): projected
    ~+11.6 TF/s of VPU cost removed (tools/out/dx_tail_exact_ab.json) but
    crashes the remote compiler (HTTP 500, the recorded offset-mismatch-
    concat error class).
  * ``strip96`` — 96-row strip blocks in the fused RDB (vs 64): measured
    ~+10% in tools/out/strip_height_ab.json but exhausts the compiler's
    VMEM budget.

Rather than re-discovering these when a backend rev fixes them, each lever
has a PROBE (a tiny representative compile+run, exactness-checked against
the safe fallback) whose verdict persists in
``runtime/build/lever_probes.json`` keyed by jax version + backend.  The
kernel defaults consult the cache and keep the safe fallback until a probe
passes.  Probes run from ``tools/probe_levers.py`` (or any caller of
:func:`probe_all`) — never implicitly on the product path, since a probe
compile can take minutes on the remote helper.
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Callable, Dict, Optional

_BUILD_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "runtime", "build")
_CACHE_PATH = os.environ.get(
    "INNFER_LEVER_CACHE", osp.join(_BUILD_DIR, "lever_probes.json"))

_mem: Optional[Dict[str, dict]] = None


def _key(name: str) -> str:
    import jax

    return f"{name}|{jax.__version__}|{jax.default_backend()}"


def _load() -> Dict[str, dict]:
    global _mem
    if _mem is None:
        try:
            with open(_CACHE_PATH) as f:
                _mem = json.load(f)
        except (OSError, ValueError):
            _mem = {}
    return _mem


def lever_enabled(name: str) -> bool:
    """True iff a probe for ``name`` passed on this jax version + backend."""
    return bool(_load().get(_key(name), {}).get("ok", False))


def record(name: str, ok: bool, note: str = "") -> None:
    import time

    cache = _load()
    cache[_key(name)] = {
        "ok": bool(ok), "note": note,
        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    try:
        os.makedirs(osp.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass


def _probe_dx_slice() -> bool:
    """Compile+run the fused RDB with DX_MODE='slice' on a small strip and
    require exact agreement with the 'roll' fallback."""
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.ops.pallas import rdb as R

    rng = np.random.default_rng(0)
    nf, gc = 64, 32
    x = jnp.asarray(rng.standard_normal((1, 64, 128, nf)), jnp.bfloat16)
    ws, bs = [], []
    for c in range(5):
        cin = nf + c * gc
        cout = gc if c < 4 else nf
        ws.append(jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16))
        bs.append(jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.bfloat16))
    old = R.DX_MODE
    try:
        R.DX_MODE = "roll"
        ref = np.asarray(R.fused_rdb(x, ws, bs, gc=gc))
        R.DX_MODE = "slice"
        out = np.asarray(R.fused_rdb(x, ws, bs, gc=gc))
    except Exception as e:  # compiler crash / HTTP 500 / Mosaic error
        record("dx_slice", False, f"{type(e).__name__}: {str(e)[:300]}")
        return False
    finally:
        R.DX_MODE = old
    ok = bool(np.array_equal(ref, out))
    record("dx_slice", ok,
           "exact vs roll" if ok else "compiled but diverged from roll")
    return ok


def _probe_strip96() -> bool:
    """Compile+run a 96-row strip block (the VMEM-crash regime)."""
    import jax.numpy as jnp
    import numpy as np

    from innfer_tpu.ops.pallas import rdb as R

    rng = np.random.default_rng(1)
    nf, gc = 64, 32
    x = jnp.asarray(rng.standard_normal((1, 96, 320, nf)), jnp.bfloat16)
    ws, bs = [], []
    for c in range(5):
        cin = nf + c * gc
        cout = gc if c < 4 else nf
        ws.append(jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16))
        bs.append(jnp.asarray(rng.standard_normal(cout) * 0.01, jnp.bfloat16))
    try:
        out96 = np.asarray(R.fused_rdb(x, ws, bs, gc=gc, block=(96, 320)))
        ref = np.asarray(R.fused_rdb(x, ws, bs, gc=gc, block=(48, 320)))
    except Exception as e:
        record("strip96", False, f"{type(e).__name__}: {str(e)[:300]}")
        return False
    ok = bool(np.allclose(out96, ref, atol=0, rtol=0))
    record("strip96", ok,
           "exact vs 48-row blocks" if ok else "compiled but diverged")
    return ok


PROBES: Dict[str, Callable[[], bool]] = {
    "dx_slice": _probe_dx_slice,
    "strip96": _probe_strip96,
}


def probe_all(force: bool = False) -> Dict[str, bool]:
    """Run every lever probe (skipping cached verdicts unless ``force``)."""
    results = {}
    for name, fn in PROBES.items():
        if not force and _key(name) in _load():
            results[name] = lever_enabled(name)
            continue
        results[name] = fn()
    return results
