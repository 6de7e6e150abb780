"""Checkpoint conversion CLI: remap layouts and rewrite .pth files torch-free.

    python -m innfer_tpu.tools.convert in.pth out.pth [--remap PASS ...]
        [--dtype fp32|fp16|bf16]

Passes (applied in order):
  swa          SWA AveragedModel unwrap        (utils/utils.py:701-720)
  mod2normal   mesrgan -> flattened esrgan     (utils/utils.py:666-698)
  normal2mod   flattened esrgan -> mesrgan     (utils/utils.py:629-663)

The output is a torch.load-compatible zip checkpoint written without torch
(checkpoint/writer.py).  Useful for normalizing model-database checkpoints
once instead of remapping at every load.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="innfer-tpu-convert", description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--remap", action="append", default=[],
                    choices=["swa", "mod2normal", "normal2mod"],
                    help="Remap passes to apply, in order (repeatable).")
    ap.add_argument("--dtype", choices=["keep", "fp32", "fp16", "bf16"],
                    default="keep", help="Convert floating tensors.")
    args = ap.parse_args(argv)

    from innfer_tpu.checkpoint.remaps import (
        mod_to_normal, normal_to_mod, swa_to_normal,
    )
    from innfer_tpu.checkpoint.torch_pickle import load_checkpoint
    from innfer_tpu.checkpoint.writer import write_checkpoint

    state = load_checkpoint(args.input)
    passes = {"swa": swa_to_normal, "mod2normal": mod_to_normal,
              "normal2mod": normal_to_mod}
    for name in args.remap:
        state = passes[name](state)

    if args.dtype != "keep":
        import ml_dtypes

        target = {"fp32": np.float32, "fp16": np.float16,
                  "bf16": ml_dtypes.bfloat16}[args.dtype]
        state = {
            k: (np.asarray(v).astype(target)
                if np.issubdtype(np.asarray(v).dtype, np.floating)
                or np.asarray(v).dtype == ml_dtypes.bfloat16
                else np.asarray(v))
            for k, v in state.items()
        }

    write_checkpoint(args.output, {k: np.asarray(v) for k, v in state.items()})
    n = sum(int(np.asarray(v).size) for v in state.values())
    print(f"{args.input} -> {args.output}: {len(state)} tensors, {n} params")
    return 0


if __name__ == "__main__":
    sys.exit(main())
