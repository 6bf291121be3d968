#!/usr/bin/env bash
# Round-5 bundle pipeline (VERDICT r4 next-round items 1+5): give the
# trained encoder the property the reference's ImageNet-VGG has and
# invertibility training does not induce — texture-DISCRIMINATIVE Gram
# statistics — then recover relu1_1 without giving back the deep
# levels. Quality is judged ONLY by the fixed round-5 protocol
# (wct_tpu/eval: pixel-space texture metrics + frozen random
# evaluator), never by any trained encoder's own features (the r4
# evaluator-dependence finding, DESIGN §4f).
#
# Stages as actually run on one TPU v5e; measured results in
# weights/README.md + DESIGN.md §4g.
set -euo pipefail
W=${W:-ckpt_r5}
mkdir -p "$W"

# A. Texture-discrimination fine-tune from the shipped round-4 bundle
#    (weights/bundle.npz — the RMS normalisation is function-preserving,
#    so this IS the r4 trained function; ckpt_r4/joint_params.npz is not
#    persisted across snapshots). The reconstruction loss stays (all
#    five levels), plus λ=0.01 · symmetric InfoNCE over per-level Gram
#    vectors of two random 128px crops per pooled image
#    (relu2_1/relu3_1/relu4_1, τ=0.2): same image's crops are
#    positives, other images negatives.
python -u scripts/train_encoder.py --out-dir "$W" \
  --pool-file ckpt_r4/pool_16384_256.npy --pool 16384 --size 256 \
  --batch 16 --steps 3000 --lr 5e-5 --eval-every 1000 --save-every 1000 \
  --texture-weight 0.01 --init weights/bundle.npz

# B. Shallow recovery (VERDICT r4 item 5): freeze conv2_1+ and every
#    deep decoder (optax.set_to_zero, not lr-damping), train ONLY
#    conv1_1/conv1_2 + the relu1_1 decoder on reconstruction. Deep
#    levels' reconstruction terms stay in the loss THROUGH the frozen
#    trunk, so conv1 cannot buy relu1_1 dB by poisoning the deep
#    features.
python -u scripts/train_encoder.py --out-dir "$W/shallow" \
  --pool-file ckpt_r4/pool_16384_256.npy --pool 16384 --size 256 \
  --batch 16 --steps 1500 --lr 1e-4 --eval-every 750 --save-every 750 \
  --shallow-recover --resume "$W/joint_params.npz"

# C. Finalize: closed-form ridge re-solve of the shallow mirrors,
#    compensated unit-RMS normalisation (function-preserving, verified
#    decode∘encode unchanged), f16-storage bundle.
python -u scripts/finalize_r4_bundle.py --joint "$W/shallow/joint_params.npz" \
  --pool-file ckpt_r4/pool_16384_256.npy --out "$W/bundle_r5.npz"

# D. Judge under the FIXED protocol (r5 vs the shipped r4 bundle),
#    render the sample grid, re-floor the PSNR gates, ship only on
#    r5 ≥ r4 under the fixed evaluators.
python -u scripts/eval_style_quality.py "$W/bundle_r5.npz" weights/bundle.npz \
  --out "$W/style_quality_r5.json"
python -u scripts/make_sample_grid.py --bundle "$W/bundle_r5.npz" \
  --out "$W/samples/grid_r5.png"
# Ship gate: r5 must beat r4 on the fixed protocol's headline scores
# (lower = closer to the style's texture statistics). Exits non-zero
# otherwise, leaving weights/bundle.npz (r4) in place.
python - "$W/style_quality_r5.json" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
(p5, b5), (p4, b4) = list(r["bundles"].items())[:2]
fixed = ("pixel_spectrum", "pixel_color", "pixel_contrast",
         "pixel_pixel_agg", "frozen_gram_rel", "frozen_meanstd_rel")
wins = total = 0
for a in r["alphas"]:
    m5, m4 = b5[f"mean_a{a:g}"], b4[f"mean_a{a:g}"]
    for k in fixed:
        total += 1
        wins += m5[k] <= m4[k]
        print(f"a{a:g} {k}: r5={m5[k]:.4f} r4={m4[k]:.4f} "
              f"{'WIN' if m5[k] <= m4[k] else 'lose'}")
print(f"r5 ({p5}) wins {wins}/{total} fixed-protocol comparisons vs {p4}")
sys.exit(0 if wins * 2 >= total else 1)
EOF
cp "$W/bundle_r5.npz" weights/bundle.npz
python -u scripts/calibrate_trained_gates.py --size 160
