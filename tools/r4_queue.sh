#!/bin/bash
# Round-4 TPU measurement queue (serialize chip use; run with nohup).
# Waits for any PID in $1 to exit first (e.g. an in-flight A/B tool).
set -x
cd /root/repo

if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 20; done
fi

# 1. phase-space tail A/B (resolves the INNFER_PHASE_TAIL hook)
python tools/phase_tail_ab.py > /tmp/phase_ab.log 2>&1

# 2. PPON whole-vs-tiled artifact, finished properly (the round-4 .tmp was
#    interrupted mid third run): tiled / whole / tiled alternation, one file
{
  echo '{'
  echo '"tiled_auto":'
  python bench.py --model ppon 2>/tmp/ppon1.err
  echo ','
  echo '"whole_none":'
  python bench.py --model ppon --tile-mode none 2>/tmp/ppon2.err
  echo ','
  echo '"tiled_auto_2":'
  python bench.py --model ppon 2>/tmp/ppon3.err
  echo '}'
} > tools/out/ppon_whole_ab.json && rm -f tools/out/ppon_whole_ab.json.tmp

# 3. refresh the BASELINE table configs (supervised: updates last-good lines)
python bench.py --model srresnet > /tmp/bench_srresnet.json 2>/tmp/bench_srresnet.err
python bench.py --model unet     > /tmp/bench_unet.json     2>/tmp/bench_unet.err
python bench.py --model cyclegan > /tmp/bench_cyclegan.json 2>/tmp/bench_cyclegan.err
python bench.py --model wbc      > /tmp/bench_wbc.json      2>/tmp/bench_wbc.err
python bench.py --model chain    > /tmp/bench_chain.json    2>/tmp/bench_chain.err

# 4. the release gate, round-4 artifact
python tools/on_chip_parity.py --out ONCHIP_r04.json > /tmp/parity.log 2>&1

# 5. headline once more on the warmed cache (stability confirmation)
python bench.py > /tmp/bench_headline2.json 2>/tmp/bench_headline2.err

echo R4_QUEUE_DONE
