#!/usr/bin/env bash
# Round-2 end-to-end training run (VERDICT r1, next-round item 5):
# stand-in encoder npz → five decoders trained to convergence on
# procedural pool data → bundle → eval (reconstruction PSNR + sample
# stylizations). Real VGG weights remain unobtainable (no network,
# empty reference mount), so the encoder is the documented stand-in;
# the decoders genuinely invert it, which exercises the ENTIRE
# train→bundle→stylize→stream loop the reference's users exercised.
#
#   OUT=ckpt_r2 BATCH=16 POOL=1024 bash scripts/train_r2.sh
set -euo pipefail

OUT=${OUT:-ckpt_r2}
SIZE=${SIZE:-256}
BATCH=${BATCH:-16}
POOL=${POOL:-1024}
mkdir -p "$OUT"

if [[ ! -f "$OUT/encoder.npz" ]]; then
  # The SAME encoder weights every decoder trains against and the
  # bundle ships (seeded, reproducible). Raw init goes to a temp name;
  # $OUT/encoder.npz only appears after normalisation succeeds, so a
  # failed/interrupted first run can never leave a rerun silently
  # training against an unnormalised encoder (the DESIGN §4b failure).
  python - <<PY
import jax
from wct_tpu.models import vgg
from wct_tpu.train import checkpoint
checkpoint.save_pytree("$OUT/encoder_raw.npz",
                       {"encoder": vgg.init_encoder_params(jax.random.PRNGKey(0))})
print("raw encoder saved -> $OUT/encoder_raw.npz")
PY
  # Gatys activation normalisation (mean post-ReLU activation 1 per
  # channel, like the reference's vgg_normalised.t7) — load-bearing for
  # decoder-training conditioning, measured in DESIGN.md §4b.
  python -m wct_tpu.tools.normalize_encoder \
    "$OUT/encoder_raw.npz" "$OUT/encoder.npz" --synthetic-pool 64 --size 256
  rm -f "$OUT/encoder_raw.npz"
fi

# Shallow decoders (few layers) converge quickly; deeper ones get more
# steps. Override per level: ITER_relu3_1=20000 etc.
declare -A ITERS=(
  [relu1_1]=${ITER_relu1_1:-6000}
  [relu2_1]=${ITER_relu2_1:-8000}
  [relu3_1]=${ITER_relu3_1:-10000}
  [relu4_1]=${ITER_relu4_1:-12000}
  [relu5_1]=${ITER_relu5_1:-12000}
)

decoder_args=()
for t in relu1_1 relu2_1 relu3_1 relu4_1 relu5_1; do
  echo "=== training decoder for $t (${ITERS[$t]} iters) ==="
  # --feature-norm: the stand-in encoder's O(100) features would
  # otherwise swamp the pixel term ~6e4:1 (measured step-3000 r2:
  # feature 3.1e6 vs pixel 48) and the decoder would barely learn
  # pixel reconstruction.
  python -m wct_tpu.cli.train --relu-target "$t" \
    --synthetic --synthetic-pool "$POOL" \
    --encoder-weights "$OUT/encoder.npz" \
    --checkpoint-dir "$OUT/$t" --resume --feature-norm \
    --batch-size "$BATCH" --crop-size "$SIZE" \
    --max-iter "${ITERS[$t]}" --save-iter 2000 --summary-iter 200
  decoder_args+=(--decoder "$t=$OUT/$t/decoder_$t.npz")
done

# float16 storage halves the committed artifact; weights are loaded
# back to f32 (quantization ~1e-3 relative, far under the decoders'
# reconstruction error).
python -m wct_tpu.tools.make_bundle --encoder "$OUT/encoder.npz" \
  --store-dtype float16 "${decoder_args[@]}" "$OUT/bundle.npz"
echo "bundle ready: $OUT/bundle.npz"

python scripts/eval_bundle.py "$OUT/bundle.npz" --out-dir "$OUT/samples"
