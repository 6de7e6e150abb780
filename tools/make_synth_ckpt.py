"""Write a random-init checkpoint of any family as a real .pth file.

    python tools/make_synth_ckpt.py 4x_test.pth --family esrgan --nb 23 --nf 64 --scale 4

Useful for benchmarks, demos, and driving the CLI without downloading
model-database weights.  Uses the torch-free writer, so the output loads in
torch and in this framework alike.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output")
    ap.add_argument("--family", default="esrgan",
                    choices=["esrgan", "srresnet", "ppon", "pan", "unet",
                             "cyclegan", "wbc"])
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--nb", type=int, default=None)
    ap.add_argument("--nf", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", choices=["fp32", "fp16"], default="fp16")
    args = ap.parse_args(argv)

    import numpy as np

    sys.path.insert(0, ".")
    from innfer_tpu.checkpoint.writer import write_checkpoint
    from tools import synth_params as SP

    makers = {
        "esrgan": SP.esrgan_state, "srresnet": SP.srresnet_state,
        "ppon": SP.ppon_state, "pan": SP.pan_state, "unet": SP.unet_state,
        "cyclegan": SP.cyclegan_state, "wbc": SP.wbc_state,
    }
    kw = {"seed": args.seed}
    if args.family in ("esrgan", "srresnet", "ppon", "pan"):
        kw["scale"] = args.scale
    if args.nb is not None:
        kw["nb" if args.family != "cyclegan" else "n_blocks"] = args.nb
    if args.nf is not None:
        kw["nf" if args.family not in ("unet", "cyclegan") else "ngf"] = args.nf
    state = makers[args.family](**kw)
    if args.dtype == "fp16":
        state = {k: v.astype(np.float16) if v.dtype == np.float32 else v
                 for k, v in state.items()}
    write_checkpoint(args.output, state)
    n = sum(v.size for v in state.values())
    print(f"{args.output}: {args.family} scale={args.scale} "
          f"{len(state)} tensors, {n} params, {args.dtype}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
