"""Multi-host scale-out: image-level data parallelism across processes.

The unit of work is one image (tiles parallelize across a host's local
chips over ICI; images parallelize across hosts over DCN).  There is no
cross-host communication in the hot loop — hosts stripe the sorted input
list deterministically, so the scheme needs no coordinator and tolerates a
missing/failed host re-run (just re-run its shard index).

Initialize with ``init_distributed`` on a real multi-host pod slice, or
pass explicit (shard_index, num_shards) for coordinator-free setups (the
CLI flags --shard-index/--num-shards).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed (multi-host); returns (rank, world)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def shard_paths(paths: List[str], shard_index: int, num_shards: int) -> List[str]:
    """Deterministic striped split of the (sorted) work list."""
    if num_shards <= 1:
        return list(paths)
    if not (0 <= shard_index < num_shards):
        raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
    return [p for i, p in enumerate(paths) if i % num_shards == shard_index]
