#!/usr/bin/env bash
# Round-3 probe (VERDICT r3 item 1 diagnosis): is the 12-20 dB plateau
# an objective-balance problem? Train pixel-ONLY (feature-weight 0) at
# higher lr for a few thousand steps on the same encoder/pool as r2 and
# compare pixel MSE against the r2 runs (relu1_1 0.0098, relu2_1 0.055).
set -euo pipefail
P=${P:-ckpt_probe}
mkdir -p "$P"
for t in relu1_1 relu2_1; do
  python -m wct_tpu.cli.train --relu-target "$t" \
    --synthetic --synthetic-pool 1024 \
    --encoder-weights ckpt_r3/encoder.npz \
    --checkpoint-dir "$P/pix_$t" --feature-weight 0 \
    --learning-rate 3e-4 --lr-decay 1e-5 \
    --batch-size 16 --crop-size 256 \
    --max-iter 3000 --save-iter 3000 --summary-iter 200
done
