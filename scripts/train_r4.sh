#!/usr/bin/env bash
# Round-4 bundle pipeline (VERDICT r3 next-round items 1+2): train the
# ENCODER itself — the round-3 "encoder-information-bound" ceiling was
# conditional on the encoder staying a random projection, and breaking
# it took one joint reconstruction run. Stages as actually run on one
# TPU v5e; measured results in weights/README.md + DESIGN.md §4d.
set -euo pipefail
W=${W:-ckpt_r4}
mkdir -p "$W"

# 0. Round-4 training pool: 16384 v2 images (v1 composites + photo-
#    patch mosaics from the non-eval bundled photographs + warped
#    fractals + defocus/finishing), 256px uint8, ~20 min on this
#    1-core host, cached to disk, device-resident during training.
#    (train/data.py::rich_pool; generated implicitly by step 1.)

# 1. Joint encoder+decoder training from the round-3 bundle init:
#    L = Σ_t MSE(dec_t(enc_t(x)), x), one trunk pass feeding all five
#    decoders, Adam 1e-4 (inverse-time decay 2e-5), grad-clip 1.0,
#    batch 16 × 256px, 12k steps (~2 h at ~30 img/s through the
#    tunnel). Best-composed-cascade checkpoint kept continuously.
python -u scripts/train_encoder.py --out-dir "$W" --steps 12000 \
  --batch 16 --eval-every 500 --save-every 1000

# 2. Finalize: closed-form ridge re-solve of the shallow mirrors
#    (joint SGD trades relu1_1's exactly-solvable conv away; the solve
#    recovers it), then FUNCTION-PRESERVING activation normalisation
#    (compensated Gatys rescale — decode∘encode verified unchanged to
#    fp roundoff), f16-storage bundle.
python -u scripts/finalize_r4_bundle.py --joint "$W/joint_params.npz" \
  --pool-file "$W/pool_16384_256.npy" --out "$W/bundle_r4.npz"

# 3. Evaluate + ship (replaces weights/bundle.npz after comparing
#    against the round-3 numbers), then recalibrate the trained-
#    fidelity gates at 160px against the new bundle.
python -u scripts/eval_bundle.py "$W/bundle_r4.npz" --out-dir "$W/samples"
cp "$W/bundle_r4.npz" weights/bundle.npz
python -u scripts/calibrate_trained_gates.py --size 160
