#!/usr/bin/env python
"""Quantitative STYLIZATION quality under the FIXED round-5 protocol.

    python scripts/eval_style_quality.py weights/bundle.npz \
        [more_bundles.npz ...] [--evaluator PATH] [--size 256]

Round-5 protocol (VERDICT r4 item 1; rationale DESIGN §4f). The
primary metrics are EVALUATOR-ROBUST — no trained bundle can be
favoured by construction:

- pixel-space texture statistics (wct_tpu/eval/texture.py): radial
  FFT spectrum, color quantile EMD, multi-scale local contrast —
  stylized output vs style image, no learned components;
- Gram/mean-std distances under the FROZEN pinned-seed CReLU-
  orthogonal evaluator (wct_tpu/eval/frozen.py), never trained;
- anchors: each pair also scores the RAW CONTENT image against the
  style under the same metrics — the number stylization must beat —
  and alpha=0 outputs, which should stay near the content anchor.

The round-4 learned-evaluator Gram metrics (Li et al.,
arXiv:1705.08086 §4 form: relative Gram/mean-std/content distances
under --evaluator's encoder) are still computed and reported under
"legacy_*" keys — they remain useful for CONTROLLED comparisons (same
evaluator, two bundles) but are evaluator-dominated across rounds
(measured: the r3-vs-r4 comparison inverts with the evaluator,
ckpt_r4/style_quality_r4eval.json) and carry no quality claim alone.

Pairs: real-photo content x {real, procedural} styles + procedural
pairs; alphas 0.6 and 1.0. JSON report per bundle to --out.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def find_real_images(size: int):
    """Bundled real photos (matplotlib/sklearn sample data), cropped."""
    import site

    from wct_tpu.utils import images

    found = []
    for cand in (
        "matplotlib/mpl-data/sample_data/grace_hopper.jpg",
        "sklearn/datasets/images/china.jpg",
        "sklearn/datasets/images/flower.jpg",
    ):
        for sp in site.getsitepackages():
            f = Path(sp) / cand
            if f.exists():
                found.append(
                    images.center_crop(
                        images.resize_to(images.get_img(f), size), size
                    )
                )
                break
    return found


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bundles", nargs="+")
    ap.add_argument("--evaluator", default=None,
                    help="bundle whose ENCODER scores all outputs "
                    "(default: the first bundle)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--alphas", default="0.6,1.0")
    ap.add_argument("--out", default=None, help="write JSON here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import cascade, vgg
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()
    S = args.size
    alphas = tuple(float(a) for a in args.alphas.split(","))
    eval_bundle = checkpoint.load_pytree(args.evaluator or args.bundles[0])
    eval_enc = eval_bundle["encoder"]
    targets = vgg.RELU_TARGETS

    # ---- evaluator feature/statistic extraction (f32, jitted) ----
    @jax.jit
    def features(img):  # [H,W,3] -> per-level (gram, mean, std, feat4)
        acts = vgg.encode_multi(eval_enc, img[None].astype(jnp.float32),
                                targets)
        out = {}
        for t in targets:
            f = acts[t][0].reshape(-1, acts[t].shape[-1])  # [HW, C]
            out[t] = {
                "gram": f.T @ f / f.shape[0],
                "mean": f.mean(0),
                "std": f.std(0),
            }
        out["content_feat"] = acts["relu4_1"][0]
        return out

    def rel(a, b):  # ||a-b||_F / ||b||_F  (f64 on host)
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))

    from wct_tpu.eval import frozen, texture

    def score(out_img, c_feats, s_feats, style_img, frozen_style):
        out_img = np.clip(out_img, 0, 1)
        o = jax.device_get(features(jnp.asarray(out_img)))
        gram = {t: rel(o[t]["gram"], s_feats[t]["gram"]) for t in targets}
        meanstd = {
            t: 0.5 * (rel(o[t]["mean"], s_feats[t]["mean"])
                      + rel(o[t]["std"], s_feats[t]["std"]))
            for t in targets
        }
        row = {
            # -- fixed protocol (evaluator-robust, cross-round) --
            **{f"pixel_{k}": v
               for k, v in texture.texture_distances(out_img, style_img).items()},
            **frozen.gram_distance(out_img, frozen_style),
            # -- legacy (learned evaluator; controlled comparisons only) --
            "legacy_style_gram_rel": float(np.mean(list(gram.values()))),
            "legacy_style_gram_rel_per_level": gram,
            "legacy_style_meanstd_rel": float(np.mean(list(meanstd.values()))),
            "legacy_content_rel": rel(
                o["content_feat"], c_feats["content_feat"]
            ),
        }
        return row

    # ---- content/style pairs ----
    real = find_real_images(S)
    rng_c = np.random.default_rng(7)
    rng_s = np.random.default_rng(99)
    proc_c = synthetic_image(rng_c, S)
    proc_s = synthetic_image(rng_s, S)
    pairs = [("proc_proc", proc_c, proc_s)]
    if len(real) >= 2:
        pairs.append(("real_real", real[0], real[1]))
        pairs.append(("real_procstyle", real[0], proc_s))
    if len(real) >= 3:
        pairs.append(("real_real2", real[0], real[2]))

    pair_feats = {
        name: (jax.device_get(features(jnp.asarray(c))),
               jax.device_get(features(jnp.asarray(s))))
        for name, c, s in pairs
    }
    frozen_styles = {name: frozen.gram_stats(s) for name, c, s in pairs}

    _SUMMARY = ("pixel_spectrum", "pixel_color", "pixel_contrast",
                "pixel_pixel_agg", "frozen_gram_rel", "frozen_meanstd_rel",
                "legacy_style_gram_rel", "legacy_style_meanstd_rel",
                "legacy_content_rel")

    report = {"size": S, "alphas": list(alphas),
              "evaluator": args.evaluator or args.bundles[0],
              "frozen_evaluator_fingerprint": frozen.FINGERPRINT,
              "bundles": {}}
    # The anchor every stylization must beat: the RAW CONTENT image
    # scored against the style under the fixed metrics.
    anchors = {}
    for name, c, s in pairs:
        c_feats, s_feats = pair_feats[name]
        anchors[name] = score(c, c_feats, s_feats, s, frozen_styles[name])
    report["content_anchor"] = anchors
    report["content_anchor_mean"] = {
        m: float(np.mean([anchors[n][m] for n in anchors])) for m in _SUMMARY
    }

    for bpath in args.bundles:
        params = checkpoint.load_pytree(bpath)
        cfg = cascade.CascadeConfig()
        rows = {}
        for name, c, s in pairs:
            cache = cascade.precompute_style(
                params["encoder"], jnp.asarray(s), cfg
            )
            c_feats, s_feats = pair_feats[name]
            for alpha in alphas:
                out = np.asarray(cascade.stylize(
                    params, jnp.asarray(c)[None], cache, alpha, cfg
                )[0])
                rows[f"{name}_a{alpha:g}"] = score(
                    out, c_feats, s_feats, s, frozen_styles[name]
                )
        # summary: mean over pairs at each alpha
        for alpha in alphas:
            sel = [v for k, v in rows.items() if k.endswith(f"_a{alpha:g}")]
            rows[f"mean_a{alpha:g}"] = {
                m: float(np.mean([r[m] for r in sel])) for m in _SUMMARY
            }
        report["bundles"][bpath] = rows
        for alpha in alphas:
            m = rows[f"mean_a{alpha:g}"]
            a = report["content_anchor_mean"]
            print(f"{bpath}  alpha={alpha:g}\n"
                  f"  FIXED  pixel_agg={m['pixel_pixel_agg']:.4f} "
                  f"(anchor {a['pixel_pixel_agg']:.4f})  "
                  f"spectrum={m['pixel_spectrum']:.4f} "
                  f"(a {a['pixel_spectrum']:.4f})  "
                  f"color={m['pixel_color']:.4f} (a {a['pixel_color']:.4f})  "
                  f"contrast={m['pixel_contrast']:.4f} "
                  f"(a {a['pixel_contrast']:.4f})\n"
                  f"  FROZEN gram={m['frozen_gram_rel']:.4f} "
                  f"(anchor {a['frozen_gram_rel']:.4f})  "
                  f"meanstd={m['frozen_meanstd_rel']:.4f} "
                  f"(a {a['frozen_meanstd_rel']:.4f})\n"
                  f"  legacy gram={m['legacy_style_gram_rel']:.4f}  "
                  f"meanstd={m['legacy_style_meanstd_rel']:.4f}  "
                  f"content={m['legacy_content_rel']:.4f}", flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=1))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
