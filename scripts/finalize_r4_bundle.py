#!/usr/bin/env python
"""Finalize the round-4 trained bundle from the joint training output.

    python scripts/finalize_r4_bundle.py --joint ckpt_r4/joint_params.npz \
        --pool-file ckpt_r4/pool_16384_256.npy --out ckpt_r4/bundle_r4.npz

Stages (each evaluated; best-per-level kept — levels are independent
given the frozen trained encoder, with the composed α=0 cascade PSNR
as the tiebreaker):

1. eval the joint-training params as-is;
2. closed-form ridge RE-SOLVE of the shallow mirror convs against the
   trained encoder (train/layerwise.py decoder-forced stats): joint
   SGD trades relu1_1's exactly-solvable single conv away (58 → ~48 dB
   at step 500) because its gradient is tiny next to the deep levels';
   the ridge solve recovers it exactly. relu2_1's two-conv mirror gets
   a Gauss–Seidel sweep (solve dec_conv2_1, update, then dec_conv1_1);
3. FUNCTION-PRESERVING activation normalisation
   (tools/normalize_encoder.py::normalize_bundle_compensated) with a
   verification that every level's decode∘encode is unchanged to fp
   roundoff — the default `--norm-stat rms` drives unit per-channel
   RMS (unit second moment; chosen for its clean WCT spectrum, DESIGN
   §4e). The Gatys unit-MEAN property the real vgg_normalised.t7 has
   is available via `--norm-stat mean`;
4. save float16-storage bundle (re-verifying the drift check on the
   quantized-then-upcast tree, i.e. on what ships); run
   scripts/eval_bundle.py separately for the full report.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def psnr(mse: float) -> float:
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--joint", default="ckpt_r4/joint_params.npz")
    ap.add_argument("--pool-file", default="ckpt_r4/pool_16384_256.npy")
    ap.add_argument("--out", default="ckpt_r4/bundle_r4.npz")
    ap.add_argument("--stats-images", type=int, default=512,
                    help="pool slice for the ridge-stats passes")
    ap.add_argument("--norm-images", type=int, default=96,
                    help="pool slice for activation normalisation")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lam", type=float, default=1e-4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--norm-stat", default="rms", choices=("mean", "rms"),
                    help="per-channel statistic normalised to 1. rms "
                    "(default) bounds channel variances at 1 — joint "
                    "training produces spiky channels (mean~1, sigma~1600) "
                    "that wreck WCT spectrum conditioning under 'mean' "
                    "(see normalize_encoder.py docstring for the measured "
                    "ledger)")
    ap.add_argument("--skip-resolve", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.tools.normalize_encoder import normalize_bundle_compensated
    from wct_tpu.train import checkpoint, layerwise
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()
    tree = checkpoint.load_pytree(args.joint)
    enc = tree["encoder"]
    decs = {t: tree["decoders"][t] for t in vgg.RELU_TARGETS}

    pool = np.load(args.pool_file, mmap_mode="r")
    rng = np.random.default_rng(12345)
    held = np.stack([synthetic_image(rng, args.size) for _ in range(args.n_eval)])
    held_j = jnp.asarray(held)

    def eval_level(dec_params, t):
        code = vgg.encode(enc, held_j, t)
        rec = np.asarray(dec_lib.decode(dec_params, code, t))
        return psnr(float(np.mean(
            (np.clip(rec, 0, 1).astype(np.float64) - held) ** 2)))

    def eval_cascade(decoders):
        x = held_j
        for t in reversed(vgg.RELU_TARGETS):
            code = vgg.encode(enc, x, t)
            x = jnp.clip(dec_lib.decode(decoders[t], code, t), 0, 1)
        return psnr(float(np.mean((np.asarray(x, np.float64) - held) ** 2)))

    base = {t: eval_level(decs[t], t) for t in vgg.RELU_TARGETS}
    print("joint params:", {t: round(v, 2) for t, v in base.items()},
          f"cascade={eval_cascade(decs):.2f}", flush=True)

    if not args.skip_resolve:
        # decoder-forced ridge re-solves for the shallow mirrors
        n = min(args.stats_images, pool.shape[0])
        for t, convs in (("relu1_1", ["dec_conv1_1"]),
                         ("relu2_1", ["dec_conv2_1", "dec_conv1_1"])):
            cand = {k: dict(v) for k, v in decs[t].items()}
            for only in convs:  # Gauss–Seidel order: deepest first
                stats = layerwise.init_refit_stats(t, only=only)
                for i in range(0, n, args.batch):
                    batch = jnp.asarray(np.ascontiguousarray(
                        pool[i : i + args.batch]))
                    stats = layerwise.accumulate_refit_stats(
                        stats, enc, cand, batch, target=t, subsample=4,
                        only=only,
                    )
                solved = layerwise.solve_refit(
                    jax.device_get(stats), t, lam=args.lam
                )
                cand[only] = solved[only]
            p_new = eval_level(cand, t)
            print(f"{t}: joint {base[t]:.2f} dB vs re-solved {p_new:.2f} dB",
                  flush=True)
            if p_new > base[t]:
                decs[t] = cand
                base[t] = p_new

    print("pre-normalisation best:",
          {t: round(v, 2) for t, v in base.items()},
          f"cascade={eval_cascade(decs):.2f}", flush=True)

    # function-preserving normalisation + verification
    norm_pool = (
        np.asarray(pool[: args.norm_images], np.float32) / 255.0
    )
    bundle = {"encoder": enc, "decoders": decs}
    normed, report = normalize_bundle_compensated(
        bundle, norm_pool, stat=args.norm_stat
    )
    worst = 0.0
    for t in vgg.RELU_TARGETS:
        a = np.asarray(dec_lib.decode(
            decs[t], vgg.encode(enc, held_j[:2], t), t))
        b = np.asarray(dec_lib.decode(
            normed["decoders"][t],
            vgg.encode(normed["encoder"], held_j[:2], t), t))
        worst = max(worst, float(np.abs(a - b).max()))
    print(f"normalisation function-preservation: worst |Δ| = {worst:.2e}",
          flush=True)
    assert worst < 1e-3, "compensated normalisation changed the function"

    # mixed-precision storage: f16 where it fits, f32 where the
    # compensated normalisation blew magnitudes past f16 range (near-
    # dead channels get huge next-conv compensation factors; measured
    # conv5_1 |w|max 3.8e5 on the round-4 bundle). load_pytree upcasts
    # f16 back to f32, so compute is identical either way.
    def to_storage(x):
        x = np.asarray(x)
        if x.dtype == np.float32 and np.abs(x).max() < 3e4:
            return x.astype(np.float16)
        return x

    normed = jax.tree.map(to_storage, jax.device_get(normed))

    # re-verify the SHIPPED artifact: upcast the quantized tree back
    # to f32 (what load_pytree will hand to compute) and re-run the
    # decode∘encode drift check against the pre-normalisation
    # function, so the guarantee covers f16 rounding, not just the
    # save/load round trip.
    shipped = jax.tree.map(
        lambda x: np.asarray(x, np.float32), normed
    )
    worst_q = 0.0
    for t in vgg.RELU_TARGETS:
        a = np.asarray(dec_lib.decode(
            decs[t], vgg.encode(enc, held_j[:2], t), t))
        b = np.asarray(dec_lib.decode(
            shipped["decoders"][t],
            vgg.encode(shipped["encoder"], held_j[:2], t), t))
        worst_q = max(worst_q, float(np.abs(a - b).max()))
    print(f"f16-storage function-preservation: worst |Δ| = {worst_q:.2e}",
          flush=True)
    assert worst_q < 5e-3, "f16 storage quantization changed the function"

    checkpoint.save_pytree(args.out, normed)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
