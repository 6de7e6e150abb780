"""Run the Mosaic-blocked-lever compile probes and persist verdicts.

    python tools/probe_levers.py [--force]

Each probe attempts a tiny representative compile of a lever the current
remote Mosaic compiler is known to crash on (dx_slice, strip96 — see
innfer_tpu/ops/pallas/levers.py) and records the verdict in
runtime/build/lever_probes.json.  A passing probe upgrades the kernel
defaults on the next process start; run this after a backend/compiler
update.  Expect minutes per probe on the remote compile helper — run in
background on the real chip.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true",
                    help="re-probe even with a cached verdict")
    args = ap.parse_args()
    from innfer_tpu.ops.pallas import levers

    results = levers.probe_all(force=args.force)
    print(json.dumps({"levers": results, "cache": levers._CACHE_PATH}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
