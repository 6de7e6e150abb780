#!/bin/bash
set -x
cd /root/repo
python bench.py --model unet --batch 32 > /tmp/bench_unet32.json 2>/tmp/bench_unet32.err
python bench.py --model wbc --batch 4 > /tmp/bench_wbc4.json 2>/tmp/bench_wbc4.err
python bench.py --model cyclegan --tile-mode none --batch 8 > /tmp/bench_cg8.json 2>/tmp/bench_cg8.err
echo R4_QUEUE3_DONE
