#!/usr/bin/env bash
# Train the full per-level decoder set and assemble the inference bundle.
#
# The reference trains one decoder per train.py invocation (SURVEY.md
# C12); this script runs the five invocations and bundles the results.
# Point CONTENT_DIR at a large image corpus (the reference used
# MS-COCO train2014); ENCODER should come from tools/convert_t7 on
# vgg_normalised.t7 (falls back to --synthetic + random encoder for a
# pipeline smoke run when unset).
set -euo pipefail

CONTENT_DIR="${CONTENT_DIR:-}"
ENCODER="${ENCODER:-}"
OUT_DIR="${OUT_DIR:-ckpt}"
MAX_ITER="${MAX_ITER:-160000}"
BATCH="${BATCH:-8}"

common_args=(--batch-size "$BATCH" --crop-size 256 --max-iter "$MAX_ITER"
             --save-iter 5000 --summary-iter 100)
if [[ -n "$CONTENT_DIR" ]]; then
  common_args+=(--content-path "$CONTENT_DIR")
else
  echo "CONTENT_DIR unset: synthetic smoke-training only" >&2
  common_args+=(--synthetic)
fi
if [[ -n "$ENCODER" ]]; then
  common_args+=(--encoder-weights "$ENCODER")
fi

decoder_args=()
for target in relu1_1 relu2_1 relu3_1 relu4_1 relu5_1; do
  echo "=== training decoder for $target ==="
  python -m wct_tpu.cli.train --relu-target "$target" \
    --checkpoint-dir "$OUT_DIR/$target" --resume "${common_args[@]}"
  decoder_args+=(--decoder "$target=$OUT_DIR/$target/decoder_$target.npz")
done

if [[ -n "$ENCODER" ]]; then
  python -m wct_tpu.tools.make_bundle --encoder "$ENCODER" \
    "${decoder_args[@]}" "$OUT_DIR/bundle.npz"
  echo "bundle ready: $OUT_DIR/bundle.npz"
else
  echo "no ENCODER set; skipping bundle (decoders are in $OUT_DIR/*/)" >&2
fi
