#!/usr/bin/env python
"""Closed-form (ridge) solve of the relu1_1 decoder — the level's exact ceiling.

The relu1_1 decoder is ONE linear 3×3 reflect-padded conv (the mirror of
reference model.py:~85's shallowest decoder), so its MSE-optimal weights
are a linear least-squares problem over 3×3×64 feature patches:

    minimize  ||P w - y||²  +  lam ||w||²

with P the reflect-padded patch matrix and y the target pixels. Solving
the 577×577 normal equations over a few hundred procedural images gives
the GLOBAL optimum for this architecture+encoder — which both (a)
reveals whether the r2 plateau (20.2 dB) was optimization or ceiling,
and (b) yields shippable weights directly (round-3 quality push,
VERDICT r2 item 1).

    python scripts/exp_linear_decoder.py --n-train 200 --out dec.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def patches_reflect(feat: np.ndarray, k: int = 3) -> np.ndarray:
    """[H,W,C] → [(H*W), k*k*C] reflect-padded patch matrix (matches
    ops.convs.conv2d_reflect's padding semantics)."""
    h, w, c = feat.shape
    p = k // 2
    fp = np.pad(feat, ((p, p), (p, p), (0, 0)), mode="reflect")
    win = np.lib.stride_tricks.sliding_window_view(fp, (k, k), axis=(0, 1))
    # win: [H, W, C, k, k] → [H*W, k, k, C] ordered to match conv kernel
    # layout [kh, kw, in, out]
    win = win.transpose(0, 1, 3, 4, 2).reshape(h * w, k * k * c)
    return win


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--encoder", default="ckpt_r3/encoder.npz")
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lam", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-seed", type=int, default=12345)
    ap.add_argument("--out", default=None, help="save solved decoder npz here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.models import vgg
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import synthetic_image

    enc = checkpoint.load_pytree(args.encoder)
    enc = enc["encoder"] if "encoder" in enc else enc
    target = "relu1_1"
    k = 3
    d = k * k * vgg.TARGET_CHANNELS[target] + 1  # +1 bias column

    encode = jax.jit(lambda x: vgg.encode(enc, x, target))

    rng = np.random.default_rng(args.seed)
    G = np.zeros((d, d), np.float64)
    b = np.zeros((d, 3), np.float64)
    for i in range(args.n_train):
        img = synthetic_image(rng, args.size)
        feat = np.asarray(encode(jnp.asarray(img)[None])[0], np.float64)
        P = patches_reflect(feat)
        P = np.concatenate([P, np.ones((P.shape[0], 1))], axis=1)
        y = img.reshape(-1, 3).astype(np.float64)
        G += P.T @ P
        b += P.T @ y
        if (i + 1) % 50 == 0:
            print(f"accumulated {i + 1}/{args.n_train}")

    n_px = args.n_train * args.size * args.size
    reg = args.lam * (G.trace() / d)
    w = np.linalg.solve(G + reg * np.eye(d), b)  # [d, 3]

    # report train + held-out PSNR of the solved decoder
    def psnr_of(seed, n):
        r = np.random.default_rng(seed)
        vals = []
        for _ in range(n):
            img = synthetic_image(r, args.size)
            feat = np.asarray(encode(jnp.asarray(img)[None])[0], np.float64)
            P = patches_reflect(feat)
            P = np.concatenate([P, np.ones((P.shape[0], 1))], axis=1)
            pred = np.clip(P @ w, 0, 1)
            mse = np.mean((pred - img.reshape(-1, 3)) ** 2)
            vals.append(10 * np.log10(1.0 / mse))
        return float(np.mean(vals))

    train_psnr = psnr_of(args.seed + 777, args.n_eval)
    eval_psnr = psnr_of(args.eval_seed, args.n_eval)
    print(f"\nsolved ridge decoder over {n_px} pixels (lam {args.lam}):")
    print(f"  fresh-data PSNR {train_psnr:.2f} dB | held-out(eval-seed) "
          f"{eval_psnr:.2f} dB")

    if args.out:
        # decoder param tree for relu1_1: one conv named like the mirror
        from wct_tpu.models import decoder as dec_lib

        params = dec_lib.init_decoder_params(jax.random.PRNGKey(0), target)
        [conv_name] = [n for n in params]
        kern = (
            w[:-1]
            .reshape(k, k, vgg.TARGET_CHANNELS[target], 3)
            .astype(np.float32)
        )
        params[conv_name]["w"] = jnp.asarray(kern)
        params[conv_name]["b"] = jnp.asarray(w[-1].astype(np.float32))
        # verify through the real decode path
        r = np.random.default_rng(args.eval_seed)
        img = synthetic_image(r, args.size)
        feat = encode(jnp.asarray(img)[None])
        dec = np.asarray(dec_lib.decode(params, feat, target)[0])
        mse = np.mean((np.clip(dec, 0, 1) - img) ** 2)
        print(f"  via dec_lib.decode: {10 * np.log10(1 / mse):.2f} dB")
        checkpoint.save_pytree(args.out, params)
        print(f"  saved -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
