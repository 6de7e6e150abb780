"""TPU Pallas kernels (lazy: importing this package does not pull in
jax.experimental.pallas — the kernels import it themselves)."""


def dim_pallas_fast(dim: int) -> bool:
    """True when rdb._pick_block finds a >=64 block for this tile
    dimension — the regime where the fused RDB beats XLA (measured round 2:
    38.5-42.6 TF/s at 64-128 blocks vs XLA's 33; 26.9 at 32).  Shared by
    the model-side auto gate (models/rrdb) and the tile planner's quantum
    cost guard (tiling/plan)."""
    if dim % 64 == 0:
        return True
    return 64 <= dim <= 128 and dim % 16 == 0
