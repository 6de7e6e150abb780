#!/bin/bash
# Round-4 second measurement queue: re-run the parity gate (np.bool_ fix),
# re-capture the headline, then the batched-mode A/B.
set -x
cd /root/repo
python tools/on_chip_parity.py --out ONCHIP_r04.json > /tmp/parity2.log 2>&1
python bench.py > /tmp/bench_headline3.json 2>/tmp/bench_headline3.err
python tools/batch_ab.py > /tmp/batch_ab.log 2>&1
echo R4_QUEUE2_DONE
