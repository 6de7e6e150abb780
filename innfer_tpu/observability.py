"""Per-stage timing, logging, and profiling hooks.

The reference's only observability is ad-hoc prints (SURVEY.md §5); this
module gives the pipeline structured stage timers (host wall-clock around
device-synced sections), a standard logger, and a jax.profiler context.

Note for tunneled TPU platforms: ``block_until_ready`` may return before
device completion, so ``device_sync`` forces a scalar fetch.
"""
from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("innfer_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

_checksum = None


def device_sync(x) -> None:
    """Force device completion of ``x`` (works on tunneled platforms)."""
    global _checksum
    if _checksum is None:
        _checksum = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)).reshape(1))
    jax.device_get(_checksum(x))


class StageTimers:
    """Accumulate wall-clock per named stage; ``report()`` returns a dict."""

    def __init__(self, sync: bool = False):
        import threading

        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()  # encode stages run on pool threads

    @contextlib.contextmanager
    def stage(self, name: str, sync_val=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_val is not None:
                device_sync(sync_val)
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in self.totals
        }

    def log_report(self) -> None:
        for name, row in sorted(self.report().items()):
            logger.info("stage %-16s total=%7.3fs n=%-4d mean=%8.2fms",
                        name, row["total_s"], row["count"], row["mean_ms"])


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]):
    """jax.profiler trace context (no-op when trace_dir is falsy)."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def enable_compilation_cache() -> None:
    """Enable jax's persistent compilation cache (TPU compiles cost tens of
    seconds per shape on this class of backend); safe no-op on failure."""
    import jax

    try:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "innfer_tpu", "xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass
