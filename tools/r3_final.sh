#!/bin/bash
set -x
cd /root/repo
for m in esrgan srresnet chain unet cyclegan ppon wbc; do
  python bench.py --model $m > /tmp/final_$m.json 2>/tmp/final_$m.err
done
python tools/on_chip_parity.py --out ONCHIP_r03.json > /tmp/final_parity.log 2>&1
echo FINAL_DONE
