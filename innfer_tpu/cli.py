"""Command-line driver.

Keeps the reference CLI semantics (run.py:321-447):

    python -m innfer_tpu.cli -m 4x_model.pth [-a infer] [-i ./input]
        [-o ./output] [-s N] [-cf] [-comp] [-cpu] [-no_fp16] [-norm]

plus TPU-native controls: --tile/--overlap/--tile-mode for the static tile
grid, --tile-batch for the per-step tile chunk, --bucket for compile-shape
bucketing, and --profile for a jax.profiler trace.

-no_fp16 disables low-precision compute; the low-precision mode is bfloat16
(TPU-native) instead of the reference's fp16.
"""
from __future__ import annotations

import argparse
import os
import sys


def resolve_batch(batch: int, presets, spatial: bool = False) -> int:
    """--batch 0 (auto): the resize presets (unet/p2p; linear_resize pins
    prepared images to one shape PER ASPECT-RATIO CLASS) default to
    estimator-sized groups (InferenceSession.auto_batch: the largest
    power-of-2 within the HBM budget, capped at 32 — the old constant 8
    left UNet-256 at 62 vs 190 MP/s, tools/out/bench_last_good_unet_*.json);
    mixed-aspect directories just form more buckets (never-full buckets
    run unpadded at natural size).  Everything else stays per-image
    unless the user asks: --batch N composes with tiled presets too
    (cross-image tile stacking).  --spatial is an explicit execution-
    strategy request that batching would silently bypass, so it wins
    over auto and rejects an explicit conflict."""
    if spatial:
        if batch > 1:
            raise SystemExit(
                "--batch and --spatial are incompatible: batched groups "
                "run stacked forwards, bypassing the H-sharded spatial "
                "runner you asked for")
        return 1
    if batch:
        return batch
    # auto-batch the img2img families with measured stacking wins (pix2pix
    # 7.4->190, wbc 27.6->45.9, cg 25->47 MP/s — batch_ab/tile_stack_ab);
    # plain-SR families stay per-image: FLOP-bound (esrgan/pan: hybrid or
    # big tiles already saturate) or proven flat (ppon: the 4x tail bounds
    # dispatch groups at ~16 tiles, ppon_stack_sweep.json), and their big
    # graphs make per-(shape,N) recompiles expensive.
    return 0 if presets.family in ("pix2pix", "cyclegan", "wbc") else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="innfer-tpu", description=__doc__)
    p.add_argument("-models", "-m", type=str, required=True, help="Path to models (chain with + or >).")
    p.add_argument("-arch", "-a", type=str, default="infer", help="Model architecture.")
    p.add_argument("-input", "-i", type=str, default="./input", help="Path to read input images.")
    p.add_argument("-output", "-o", type=str, default="./output", help="Path to save output images.")
    p.add_argument("-scale", "-s", type=int, default=None, help="Model scaling factor.")
    p.add_argument("-cf", action="store_true", help="Use color correction if enabled.")
    p.add_argument("-comp", action="store_true", help="Save as comparison images if enabled.")
    p.add_argument("-no_tpu", "-cpu", dest="cpu", action="store_true", help="Run on CPU.")
    p.add_argument("-no_fp16", dest="no_lowp", action="store_true",
                   help="Disable bf16 compute (use fp32).")
    p.add_argument("-norm", action="store_true", help="Normalize images to [-1,1].")
    p.add_argument("--models-dir", type=str, default="./models",
                   help="Directory searched for partial model names.")
    p.add_argument("--tile", type=int, default=256, help="Tile size (input pixels).")
    p.add_argument("--overlap", type=int, default=16, help="Tile overlap (input pixels).")
    p.add_argument("--tile-mode",
                   choices=["auto", "uniform", "reference", "hybrid", "none"],
                   default="auto", help="Tiling strategy; 'auto' grid-fits a "
                   "(possibly rectangular) tile size per image for minimal "
                   "waste, 'uniform' uses the fixed --tile grid, 'reference' "
                   "matches the original chop grid, 'none' forces whole-image "
                   "forwards.")
    p.add_argument("--tile-batch", type=int, default=8, help="Tiles per compiled step.")
    p.add_argument("--batch", type=int, default=0,
                   help="Group N same-shape images into one stacked forward "
                   "(exact per-image parity; fills the MXU for small "
                   "inputs).  Whole-image for untiled presets; tiled "
                   "presets stack tiles from all N images into shared "
                   "dispatch groups (amortizes the per-dispatch floor that "
                   "binds CycleGAN/PPON).  Groups that would overflow HBM "
                   "fall back per-image.  0 = auto: HBM-estimator-sized "
                   "groups (<=32) for fixed-size pix2pix/UNet presets "
                   "(their resize makes every image one shape; 7.4 -> 190 "
                   "MP/s at batch 32), 1 otherwise.")
    p.add_argument("--bucket", type=int, default=0, help="Pad compile shapes to multiples.")
    p.add_argument("--fused-chain", action="store_true",
                   help="Opt-in tile-through-chain execution for model "
                   "chains: ONE tile pass runs every stage (intermediate "
                   "images never materialize).  Measured SLOWER than the "
                   "default sequential path at the product chain config "
                   "(tools/out/chain_product_ab.json: 6.2-7.5 vs 9.1 MP/s "
                   "— sequential stages ride the hybrid whole-image-trunk "
                   "upgrade), and outputs can differ near tile borders "
                   "within the chain's combined receptive field.  Kept for "
                   "floor-bound chains of non-hybrid models.")
    p.add_argument("--no-fused-chain", action="store_true",
                   help="Deprecated no-op: sequential stage-by-stage is "
                   "the default since round 5 (see --fused-chain).")
    p.add_argument("--profile", type=str, default="",
                   help="Write a jax.profiler trace to this directory.")
    p.add_argument("--timing", action="store_true",
                   help="Log per-stage wall-clock timings.")
    p.add_argument("--metrics", type=str, default="",
                   help="Ground-truth dir: compute PSNR/SSIM per output.")
    p.add_argument("--shard-index", type=int, default=None,
                   help="This host's shard of the image list (multi-host DP; "
                   "defaults to the jax process index).")
    p.add_argument("--num-shards", type=int, default=None,
                   help="Total hosts striping the image list (defaults to "
                   "the jax process count).")
    p.add_argument("--dp", type=int, default=0,
                   help="Data-parallel: shard the tile batch over this many "
                   "local devices (-1 = all devices not used by --tp).")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel: shard conv output channels over "
                   "this many devices.")
    p.add_argument("--spatial", action="store_true",
                   help="Whole-image forwards H-sharded over the --dp mesh "
                   "(halo-exchange convs) instead of tiling; for images too "
                   "large to tile-batch.  Not combinable with --tp.")
    p.add_argument("--coordinator", type=str, default=None,
                   help="jax.distributed coordinator address (multi-host).")
    p.add_argument("--num-processes", type=int, default=None,
                   help="jax.distributed process count (multi-host).")
    p.add_argument("--process-id", type=int, default=None,
                   help="This process's id for jax.distributed.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from innfer_tpu.observability import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from innfer_tpu.pipeline import InferenceSession, select_presets

    # multi-host first (must run before local device queries)
    from innfer_tpu.parallel.multihost import init_distributed

    rank, world = init_distributed(
        args.coordinator, args.num_processes, args.process_id)
    shard_index = rank if args.shard_index is None else args.shard_index
    num_shards = world if args.num_shards is None else args.num_shards

    on_tpu = jax.devices()[0].platform != "cpu"
    compute_dtype = jnp.float32 if (args.no_lowp or not on_tpu) else jnp.bfloat16

    mesh = None
    if args.dp not in (0, 1) or args.tp > 1:
        from innfer_tpu.parallel.mesh import make_mesh

        # dp=0/1 means NO data parallelism (1-wide data axis); only the
        # explicit -1 asks for "all devices not used by --tp"
        n_data = None if args.dp == -1 else max(1, args.dp)
        mesh = make_mesh(n_data=n_data, n_model=args.tp)

    if args.spatial and mesh is None:
        raise SystemExit("--spatial requires a device mesh; add --dp N")

    presets = select_presets(args.arch, args.models, norm_flag=args.norm)
    if args.tile_mode == "none":
        presets.chop = False

    session = InferenceSession(
        args.models,
        arch=args.arch,
        models_dir=args.models_dir,
        presets=presets,
        compute_dtype=compute_dtype,
        tile=args.tile,
        overlap=args.overlap,
        tile_mode=args.tile_mode if args.tile_mode != "none" else "uniform",
        tile_batch=args.tile_batch,
        bucket=args.bucket,
        scale=args.scale,
        mesh=mesh,
        spatial=args.spatial,
        fused_chain=True if args.fused_chain else None,
    )

    from innfer_tpu.observability import StageTimers, profile_trace

    timers = StageTimers() if args.timing else None
    with profile_trace(args.profile):
        session.process(
            args.input, args.output, use_color_fix=args.cf, comp=args.comp,
            shard_index=shard_index, num_shards=num_shards,
            metrics_dir=args.metrics or None, timers=timers,
            batch=resolve_batch(args.batch, presets, spatial=args.spatial),
        )
    if timers is not None:
        timers.log_report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
