#!/bin/bash
# Round-3 TPU measurement queue (serialize chip use; run with nohup).
set -x
cd /root/repo
python tools/on_chip_parity.py --out ONCHIP_r03.json
python bench.py > /tmp/bench_headline.json 2>/tmp/bench_headline.err
python bench.py --max-group-px 2400000 > /tmp/bench_grouppx.json 2>/tmp/bench_grouppx.err
python bench.py --model unet > /tmp/bench_unet.json 2>/tmp/bench_unet.err
python bench.py --model cyclegan > /tmp/bench_cyclegan.json 2>/tmp/bench_cyclegan.err
python tools/cyclegan_breakdown.py
echo QUEUE_DONE
