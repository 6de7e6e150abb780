"""TPU Pallas kernels (lazy: importing this package does not pull in
jax.experimental.pallas — the kernels import it themselves)."""


def dim_pallas_fast(dim: int) -> bool:
    """True when rdb._pick_block finds a >=64 block for this tile
    dimension — the square-block fast regime (round 2: 38.5-42.6 TF/s at
    64-128 blocks vs XLA's 33; 26.9 at 32)."""
    if dim % 64 == 0:
        return True
    return 64 <= dim <= 128 and dim % 16 == 0


def tile_pallas_fast(th: int, tw: int) -> bool:
    """True when the fused RDB has a fast block decomposition for this
    tile SHAPE: a full-width strip (rdb._auto_block; 43.4 TF/s measured
    round 3), a wide tile whose width has a strip-sized 16-mult divisor
    (whole-image hybrid trunk, e.g. 1920 -> 64x240 blocks), or the square
    64-block regime.  Shared by the model-side auto gate (models/rrdb)
    and the tile planner's quantum cost guard (tiling/plan)."""
    rows_ok = any(th % bh == 0 for bh in (64, 48, 32))
    # strip branch mirrors rdb._auto_block's bw >= 64 requirement: 16-48
    # wide tiles would fall back to narrow blocks (high halo inflation),
    # a regime never measured fast (ADVICE r3)
    if tw % 16 == 0 and 64 <= tw <= 320 and rows_ok:
        return True  # full-width strip
    if tw % 16 == 0 and tw > 320 and rows_ok:
        from innfer_tpu.ops.pallas.rdb import _wide_bw

        if _wide_bw(tw) >= 64:
            return True
    return dim_pallas_fast(th) and dim_pallas_fast(tw)
