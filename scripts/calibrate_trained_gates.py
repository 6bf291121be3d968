#!/usr/bin/env python
"""Measure everything tests/test_trained_fidelity.py asserts on.

    python scripts/calibrate_trained_gates.py [--bundle weights/bundle.npz]
        [--size 96] [--cpu]

Prints the measured statistics (oracle deviation distribution,
throughput-config deviation vs the f32+eigh path and its envelope
multiple, per-level reconstruction PSNR) so the test bounds can be set
with explicit headroom against real numbers instead of guesses. Run
after every retrain; record the output in BASELINE.md.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bundle", default=str(REPO / "weights" / "bundle.npz"))
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import cascade, decoder as dec_lib, vgg
    from wct_tpu.tools.oracle import cascade_np
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()
    params = checkpoint.load_pytree(args.bundle)
    rng = np.random.default_rng(9)  # same seed as the test
    size = args.size
    content = rng.random((size, size, 3)).astype(np.float32)
    style = rng.random((size, size, 3)).astype(np.float32)

    # -- gate 1: trained cascade vs float64 oracle --
    cfg = cascade.CascadeConfig()
    ours = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg))
    ref = cascade_np(params, content, style, 0.8, cfg.relu_targets)
    d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
    print(f"[gate1 oracle]   median {np.median(d):.3e}  "
          f"q99 {np.quantile(d, 0.99):.3e}  max {d.max():.3e}  "
          f"frac>0.05 {(d > 0.05).mean():.4f}")
    for a in (0.0, 0.4):
        o_a = np.asarray(cascade.stylize_pair(
            params, jnp.asarray(content), jnp.asarray(style), a, cfg))
        r_a = cascade_np(params, content, style, a, cfg.relu_targets)
        da = np.abs(o_a.astype(np.float64) - r_a.astype(np.float64))
        print(f"[gate1 alpha={a}] median {np.median(da):.3e}  "
              f"q99 {np.quantile(da, 0.99):.3e}  max {da.max():.3e}  "
              f"frac>0.05 {(da > 0.05).mean():.4f}")

    # -- gate 2: throughput config vs fidelity path --
    def run(c):
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), c)
        c2 = jnp.asarray(np.stack([content, content]))
        return np.asarray(cascade.stylize(params, c2, cache, 0.8, c)[0],
                          np.float32)

    # per-level: both the eigensolver-tolerance envelope and the
    # throughput-config deviation (what the per-level tests gate)
    for lvl in ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"):
        fid_l = run(cascade.CascadeConfig(
            relu_targets=(lvl,), compute_dtype="float32", method="eigh"))
        fast_l = run(cascade.CascadeConfig(
            relu_targets=(lvl,), compute_dtype="bfloat16",
            method="newton_schulz_fast", pack2_junction=True))
        orc_l = cascade_np(params, content, style, 0.8, (lvl,)).astype(
            np.float32)
        e = np.abs(fid_l.astype(np.float64) - orc_l.astype(np.float64))
        v = np.abs(fast_l.astype(np.float64) - fid_l.astype(np.float64))
        print(f"[level {lvl}] env q99 {np.quantile(e, 0.99):.2e} "
              f"max {e.max():.2e} | fast-dev q99 {np.quantile(v, 0.99):.2e} "
              f"max {v.max():.2e}")

    fid = run(cascade.CascadeConfig(compute_dtype="float32", method="eigh"))
    fast = run(cascade.CascadeConfig(
        compute_dtype="bfloat16", method="newton_schulz_fast",
        pack2_junction=True))
    oracle = cascade_np(params, content, style, 0.8,
                        cascade.DEFAULT_TARGETS).astype(np.float32)
    env = np.abs(fid.astype(np.float64) - oracle.astype(np.float64))
    dev = np.abs(fast.astype(np.float64) - fid.astype(np.float64))
    mse = float(np.mean(dev ** 2))
    psnr = float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)
    k = np.quantile(dev, 0.99) / max(np.quantile(env, 0.99), 1e-9)
    print(f"[gate2 envelope] env q99 {np.quantile(env, 0.99):.3e}  "
          f"dev q99 {np.quantile(dev, 0.99):.3e}  K {k:.1f}  "
          f"PSNR {psnr:.1f} dB  dev max {dev.max():.3e}  "
          f"dev frac>0.05 {(dev > 0.05).mean():.4f}  "
          f"env frac>0.05 {(env > 0.05).mean():.4f}  "
          f"dev median {np.median(dev):.3e}")

    # -- gate 2b: deep-level MATCHED-MASK deviation (DESIGN §2b) --
    # The tight executable form for rank-deficient levels: force the
    # float64 keep-counts into both the production f32 op (trunc_topk)
    # and the oracle (force_k); single level from the same content
    # input, so no cascade drift and no mask flips.
    from wct_tpu.ops import wct as wct_ops
    from wct_tpu.tools.oracle import decode_np, encode_np, wct_np, wct_ranks_np

    # round-4: the TRAINED encoder made relu2_1/relu3_1 rank-deficient
    # too (measured k ~ 125/128 and 199/256 at 160px, with dozens of
    # eigenvalues near the 1e-5 threshold) — measure their matched form
    # as well so their gates can move to the same mechanism.
    for lvl in ("relu2_1", "relu3_1", "relu4_1", "relu5_1"):
        fc64 = encode_np(params["encoder"], content.astype(np.float64), lvl)
        fs64 = encode_np(params["encoder"], style.astype(np.float64), lvl)
        k_c, k_s = wct_ranks_np(fc64, fs64)
        fc32 = vgg.encode(params["encoder"], jnp.asarray(content)[None], lvl)[0]
        fs32 = vgg.encode(params["encoder"], jnp.asarray(style)[None], lvl)[0]
        f32 = wct_ops.wct(fc32, fs32, 0.8, trunc_topk=(k_c, k_s))
        ours = np.asarray(dec_lib.decode(
            params["decoders"][lvl], f32[None], lvl)[0], np.float64)
        f64 = wct_np(fc64, fs64, 0.8, force_k=(k_c, k_s))
        ref = decode_np(params["decoders"][lvl], f64, lvl)
        dm = np.abs(
            np.clip(ours, 0, 1) - np.clip(ref, 0, 1)
        )
        print(f"[gate2b matched {lvl}] k_c={k_c} k_s={k_s} "
              f"median {np.median(dm):.2e} q99 {np.quantile(dm, 0.99):.2e} "
              f"max {dm.max():.2e}")

    # -- gate 2c: COMPOSED-cascade matched-mask (round-4 gate) --
    img_np = content.astype(np.float64)
    img_j = jnp.asarray(content)
    for lvl in ("relu5_1", "relu4_1", "relu3_1", "relu2_1", "relu1_1"):
        fc64 = encode_np(params["encoder"], img_np, lvl)
        fs64 = encode_np(params["encoder"], style.astype(np.float64), lvl)
        k_c, k_s = wct_ranks_np(fc64, fs64)
        f64 = wct_np(fc64, fs64, 0.8, force_k=(k_c, k_s))
        img_np = decode_np(params["decoders"][lvl], f64, lvl)
        fc32 = vgg.encode(params["encoder"], img_j[None], lvl)[0]
        fs32 = vgg.encode(params["encoder"], jnp.asarray(style)[None], lvl)[0]
        f32 = wct_ops.wct(fc32, fs32, 0.8, trunc_topk=(k_c, k_s))
        img_j = dec_lib.decode(params["decoders"][lvl], f32[None], lvl)[0]
    dc = np.abs(np.clip(np.asarray(img_j, np.float64), 0, 1)
                - np.clip(img_np, 0, 1))
    print(f"[gate2c composed-matched] median {np.median(dc):.2e} "
          f"q99 {np.quantile(dc, 0.99):.2e} frac>0.05 {(dc > 0.05).mean():.4f}")

    # -- gate 4 (round-5): AdaIN full cascade vs oracle --
    cfg_a = cascade.CascadeConfig(transform="adain")
    ours_a = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg_a))
    ref_a = cascade_np(params, content, style, 0.8, cfg_a.relu_targets,
                       transform="adain")
    da4 = np.abs(ours_a.astype(np.float64) - ref_a.astype(np.float64))
    print(f"[gate4 adain]    median {np.median(da4):.3e}  "
          f"q99 {np.quantile(da4, 0.99):.3e}  max {da4.max():.3e}")

    # -- gate 5 (round-5): swap5 — matched-mask single level + cascade --
    from wct_tpu.ops import style_swap as swap_ops
    from wct_tpu.tools.oracle import wct_style_swap_np

    lvl = "relu5_1"
    fc64 = encode_np(params["encoder"], content.astype(np.float64), lvl)
    fs64 = encode_np(params["encoder"], style.astype(np.float64), lvl)
    k_c, k_s = wct_ranks_np(fc64, fs64)
    fc32 = vgg.encode(params["encoder"], jnp.asarray(content)[None], lvl)[0]
    fs32 = vgg.encode(params["encoder"], jnp.asarray(style)[None], lvl)[0]
    w_c, mu_c = wct_ops.whitening_kernel(fc32, trunc_topk=k_c)
    w_s, k_col, mu_s = wct_ops.whiten_color_kernels(fs32, trunc_topk=k_s)
    h, w_, cch = fc32.shape
    flat_c = fc32.reshape(h * w_, cch)
    fc_white = ((flat_c - mu_c[None, :]) @ w_c).reshape(h, w_, cch)
    hs, ws = fs32.shape[0], fs32.shape[1]
    flat_s = fs32.reshape(hs * ws, cch)
    fs_white = ((flat_s - mu_s[None, :]) @ w_s).reshape(hs, ws, cch)
    swapped = swap_ops.style_swap(fc_white, fs_white, 0.6, 3, 1)
    colored = swapped.reshape(h * w_, cch) @ k_col + mu_s[None, :]
    f_sw = (0.8 * colored + 0.2 * flat_c).reshape(h, w_, cch)
    ours_sw = np.clip(np.asarray(dec_lib.decode(
        params["decoders"][lvl], f_sw[None], lvl)[0], np.float64), 0, 1)
    ref_sw = np.clip(decode_np(
        params["decoders"][lvl],
        wct_style_swap_np(fc64, fs64, 0.8, 0.6, 3, 1, force_k=(k_c, k_s)),
        lvl), 0, 1)
    d5 = np.abs(ours_sw - ref_sw)
    print(f"[gate5 swap5-matched] k_c={k_c} k_s={k_s} "
          f"median {np.median(d5):.2e} q99 {np.quantile(d5, 0.99):.2e} "
          f"max {d5.max():.2e}")

    cfg_s = cascade.CascadeConfig(swap5=True)
    ours_s5 = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg_s))
    ref_s5 = cascade_np(params, content, style, 0.8, cfg_s.relu_targets,
                        swap5=True)
    ds5 = np.abs(ours_s5.astype(np.float64) - ref_s5.astype(np.float64))
    print(f"[gate5 swap5-cascade] median {np.median(ds5):.3e}  "
          f"q99 {np.quantile(ds5, 0.99):.3e}  "
          f"frac>0.05 {(ds5 > 0.05).mean():.4f}")

    # -- gate 3: per-level reconstruction PSNR (test's exact recipe) --
    rng3 = np.random.default_rng(424242)
    batch = np.stack([synthetic_image(rng3, size) for _ in range(4)])
    jbatch = jnp.asarray(batch)
    for t in sorted(params["decoders"], key=lambda t: t[4]):
        code = vgg.encode(params["encoder"], jbatch, t)
        decoded = np.asarray(dec_lib.decode(params["decoders"][t], code, t))
        m = np.mean((np.clip(decoded, 0, 1).astype(np.float64) - batch) ** 2)
        print(f"[gate3 psnr]     {t}: {10 * np.log10(1.0 / m):.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
