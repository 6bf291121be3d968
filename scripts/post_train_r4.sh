#!/usr/bin/env bash
# Post-training chain for round 4: runs the moment train_encoder.py
# exits (watched by PID), keeping the single TPU busy end-to-end.
# Stages append to ckpt_r4/post.out; each is independently re-runnable.
set -uo pipefail
W=${W:-ckpt_r4}

echo "=== finalize ==="
python -u scripts/finalize_r4_bundle.py --joint "$W/joint_params.npz" \
  --pool-file "$W/pool_16384_256.npy" --out "$W/bundle_r4.npz"

echo "=== eval_bundle (r4) ==="
python -u scripts/eval_bundle.py "$W/bundle_r4.npz" --out-dir "$W/samples"

echo "=== style quality: r3 vs r4, frozen r3 evaluator ==="
python -u scripts/eval_style_quality.py "$W/bundle_r3_frozen.npz" \
  "$W/bundle_r4.npz" --evaluator "$W/bundle_r3_frozen.npz" \
  --out "$W/style_quality_r3eval.json"
echo "=== style quality: same, r4 evaluator (cross-check) ==="
python -u scripts/eval_style_quality.py "$W/bundle_r3_frozen.npz" \
  "$W/bundle_r4.npz" --evaluator "$W/bundle_r4.npz" \
  --out "$W/style_quality_r4eval.json"

echo "=== post_train_r4 done ==="
# The frozen-encoder ablation (decoders-only on the same rich pool —
# isolates the encoder-training effect from the data-richness effect)
# runs separately AFTER the bench sweep so headline numbers land first:
#   python -u scripts/train_encoder.py --out-dir ckpt_r4/ablate_frozen \
#     --pool-file ckpt_r4/pool_16384_256.npy --steps 6000 --batch 16 \
#     --eval-every 500 --save-every 2000 --freeze-encoder
