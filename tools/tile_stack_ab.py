"""Same-window A/B: cross-image tile stacking on the dispatch-floor configs.

VERDICT r4 #2: PPON (7.5 MP/s) and tiled CycleGAN (13-26) are pinned by the
per-dispatch floor at small-spatial slabs; whole-image batching amortized
that floor for pix2pix (batch_ab.json) but never reached tiled configs.
This tool measures the new engine path (tiled_apply B>1: tiles from N
stacked images share dispatch groups grown toward the group-px cap) against
batch 1 IN THE SAME WINDOW (the backend swings 25-50% between windows —
CLAUDE.md), via bench.py --no-supervise subprocesses.

Writes tools/out/tile_stack_ab.json.  Run on the real chip:
    nohup python tools/tile_stack_ab.py > /tmp/tile_stack_ab.log 2>&1 &
"""
from __future__ import annotations

import json
import os.path as osp
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
OUT = osp.join(REPO, "tools", "out", "tile_stack_ab.json")

CONFIGS = [
    # (model, batch) — b1 first and last per model to bound in-window drift
    ("ppon", 1), ("ppon", 4), ("ppon", 8), ("ppon", 1),
    ("cyclegan", 1), ("cyclegan", 4), ("cyclegan", 8), ("cyclegan", 1),
]


def run_one(model: str, batch: int) -> dict:
    argv = [sys.executable, osp.join(REPO, "bench.py"), "--no-supervise",
            "--model", model, "--iters", "4"]
    if batch > 1:
        argv += ["--batch", str(batch)]
    t0 = time.time()
    r = subprocess.run(argv, capture_output=True, text=True, timeout=2400)
    row = {"model": model, "batch": batch, "wall_s": round(time.time() - t0, 1)}
    if r.returncode != 0:
        row["error"] = r.stderr[-800:]
        return row
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if "value" in d:
                row.update(mps=d["value"], metric=d["metric"])
                return row
        except ValueError:
            continue
    row["error"] = "no json line"
    return row


def main() -> int:
    rows = []
    for model, batch in CONFIGS:
        row = run_one(model, batch)
        rows.append(row)
        print(json.dumps(row), flush=True)
    doc = {
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "what": ("cross-image tile stacking vs batch 1, same window "
                 "(engine.tiled_apply B>1; VERDICT r4 #2)"),
        "rows": rows,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
