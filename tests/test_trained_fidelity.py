"""Fidelity gates with TRAINED weights — the executable tolerance story.

Round-3 revision (VERDICT r2 items 2/4): the gates run at SIZE=160
(was 96, where relu4_1/relu5_1 were maximally pathological), and the
rank-deficient deep levels get TIGHT matched-mask gates instead of
loose indulgences, using the mechanism proven in DESIGN §2b:

- At 160px, relu1_1 (25600 px vs 64 ch), relu2_1 (6400 vs 128) and
  relu3_1 (1600 vs 256) have full-rank Grams — every eigenvalue clears
  the 1e-5 threshold by orders of magnitude, so the production value
  mask is flip-free and the plain f32+eigh-vs-float64-oracle
  comparison is tight (gate 2).
- relu4_1 (400 px vs 512 ch) and relu5_1 (100 vs 512) are genuinely
  rank-deficient: their near-null f32 noise eigenvalues straddle 1e-5
  and flip modes between ANY two legitimate eigensolvers (measured:
  zero float64 eigenvalues near the threshold — the flips are pure f32
  noise). The sharp executable claim is the MATCHED-MASK comparison:
  force the float64 keep-counts into both sides (production
  ``trunc_topk`` / oracle ``force_k``) and the deviation collapses to
  eigensolver tolerance (gate 2b). scripts/exp_matched_mask.py holds
  the full decomposition (flips = 15× of the composed median; the
  rest is ~100× cascade amplification of per-level fp tolerance).

All bounds measured by ``scripts/calibrate_trained_gates.py --size
160 --cpu`` (tests run on the CPU backend — constants must be measured
there; TPU medians differ ~3x) on the shipped ROUND-4 bundle and set
with explicit margin; measured values quoted per gate.

Round-4 revision: the TRAINED encoder initially made relu2_1
solver-pathological (one spiky channel -> a 2.6e6 covariance
eigenvalue, 65 near-threshold modes, cross-solver q99 0.29); the
unit-RMS compensated normalisation (tools/normalize_encoder.py,
stat='rms') removed the pathology at the source, after which EVERY
gate below measures tighter than round 3 — including the previously
indulgent unmatched tripwires.
"""

from pathlib import Path

import numpy as np
import pytest

BUNDLE = Path(__file__).resolve().parent.parent / "weights" / "bundle.npz"

pytestmark = pytest.mark.skipif(
    not BUNDLE.exists(),
    reason="trained bundle weights/bundle.npz not present",
)

SIZE = 160  # %16-aligned so the pack2/fused eligibility gates admit it


@pytest.fixture(scope="module")
def setup():
    from wct_tpu.train import checkpoint

    params = checkpoint.load_pytree(BUNDLE)
    rng = np.random.default_rng(9)  # = calibration script's seed
    content = rng.random((SIZE, SIZE, 3)).astype(np.float32)
    style = rng.random((SIZE, SIZE, 3)).astype(np.float32)
    return params, content, style


def test_alpha0_cascade_matches_oracle_hard(setup):
    """Full 5-level cascade at alpha=0 vs float64 oracle: hard bound.

    Five encode→decode round trips through every conv/pool/upsample in
    the system, compiled as ONE program, vs pure numpy float64.
    Measured (160px, r4 RMS bundle): q99 2.7e-7, max 9.9e-7.
    Bounds ~40×.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade
    from wct_tpu.tools.oracle import cascade_np

    params, content, style = setup
    cfg = cascade.CascadeConfig()
    ours = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.0, cfg))
    ref = cascade_np(params, content, style, 0.0, cfg.relu_targets)
    d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
    assert np.quantile(d, 0.99) < 1e-5, f"q99 {np.quantile(d, 0.99):.2e}"
    assert d.max() < 5e-5, f"max {d.max():.2e}"


def test_single_level_within_eigensolver_tolerance(setup):
    """Per-level stylization (f32+eigh) vs float64 oracle at alpha=0.8.

    THE north-star clause ("output matching reference stylize.py
    pixel-wise within eigensolver tolerance"), executable for the
    levels whose production value mask is flip-free (r4 RMS bundle:
    relu1_1 is full-rank; relu2_1/relu3_1 carry a handful of masked
    modes but measured flip-free at this seed). Measured q99 (160px,
    r4 RMS bundle): 3.3e-6 / 8.6e-5 / 6.9e-6; max <= 1.9e-4. Bounds
    >=20x, relu2_1 widest (5 near-threshold modes could flip under
    platform jitter; the matched-mask gate below is its tight form).
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade
    from wct_tpu.tools.oracle import cascade_np

    params, content, style = setup
    bounds = {
        "relu1_1": (1e-4, 5e-4),
        "relu2_1": (2e-3, 5e-3),
        "relu3_1": (2e-4, 1e-3),
    }
    for lvl, (bq99, bmax) in bounds.items():
        cfg = cascade.CascadeConfig(
            relu_targets=(lvl,), compute_dtype="float32", method="eigh"
        )
        ours = np.asarray(cascade.stylize_pair(
            params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg))
        ref = cascade_np(params, content, style, 0.8, (lvl,))
        d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
        assert np.quantile(d, 0.99) < bq99, (lvl, np.quantile(d, 0.99))
        assert d.max() < bmax, (lvl, d.max())


def test_deep_levels_matched_mask_within_tolerance(setup):
    """relu2_1..relu5_1 single-level, MATCHED top-k masks: tight gates.

    The rank-deficient levels' honest executable form (DESIGN §2b):
    the float64 keep-counts are forced into both the production f32
    pipeline (ops.wct trunc_topk) and the oracle (force_k), removing
    the f32-noise mask flips that make any value-threshold comparison
    a knife edge. Round-4: the trained encoder makes relu2_1 (k~125/
    128) and relu3_1 (k~199/256) rank-deficient too, so they join the
    club. Measured q99 (160px, r4 RMS bundle): relu2_1 1.0e-4,
    relu3_1 7.2e-6, relu4_1 4.0e-4 (k=380/512), relu5_1 3.4e-7
    (k=99/512). Bounds >=5x with floor 1e-4.
    """
    import jax.numpy as jnp

    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.ops import wct as wct_ops
    from wct_tpu.tools.oracle import (
        decode_np, encode_np, wct_np, wct_ranks_np,
    )

    params, content, style = setup
    bounds = {"relu2_1": (1e-3, 2e-3), "relu3_1": (1e-4, 1e-3),
              "relu4_1": (2e-3, 5e-3), "relu5_1": (1e-4, 1e-3)}
    for lvl, (bq99, bmax) in bounds.items():
        fc64 = encode_np(params["encoder"], content.astype(np.float64), lvl)
        fs64 = encode_np(params["encoder"], style.astype(np.float64), lvl)
        k_c, k_s = wct_ranks_np(fc64, fs64)
        fc32 = vgg.encode(
            params["encoder"], jnp.asarray(content)[None], lvl)[0]
        fs32 = vgg.encode(
            params["encoder"], jnp.asarray(style)[None], lvl)[0]
        f32 = wct_ops.wct(fc32, fs32, 0.8, trunc_topk=(k_c, k_s))
        ours = np.clip(np.asarray(dec_lib.decode(
            params["decoders"][lvl], f32[None], lvl)[0], np.float64), 0, 1)
        f64 = wct_np(fc64, fs64, 0.8, force_k=(k_c, k_s))
        ref = np.clip(decode_np(params["decoders"][lvl], f64, lvl), 0, 1)
        d = np.abs(ours - ref)
        assert np.quantile(d, 0.99) < bq99, (lvl, np.quantile(d, 0.99))
        assert d.max() < bmax, (lvl, d.max())


def test_throughput_config_single_level_deviation(setup):
    """bf16 + NS-fast + pack2 (the headline config) vs f32+eigh, per level.

    Bounds the throughput path's pixel deviation where it is
    attributable (single level, no cross-level amplification). With
    the r4 RMS bundle the solver-sensitivity term is gone and pure
    bf16 feature-map rounding remains, FLAT across levels — measured
    q99 (160px): 5.5e-3 / 8.3e-3 / 8.5e-3 / 8.2e-3 / 6.0e-3
    (r3 reached 2.1e-1 at relu5_1). Uniform bound 6-9x over.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade

    params, content, style = setup
    bounds = {"relu1_1": 0.05, "relu2_1": 0.05, "relu3_1": 0.05,
              "relu4_1": 0.05, "relu5_1": 0.05}

    def run(c):
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), c
        )
        c2 = jnp.asarray(np.stack([content, content]))  # pack2: even batch
        return np.asarray(
            cascade.stylize(params, c2, cache, 0.8, c)[0], np.float32
        )

    for lvl, bound in bounds.items():
        fid = run(cascade.CascadeConfig(
            relu_targets=(lvl,), compute_dtype="float32", method="eigh"))
        fast = run(cascade.CascadeConfig(
            relu_targets=(lvl,), compute_dtype="bfloat16",
            method="newton_schulz_fast", pack2_junction=True))
        dev = np.abs(fast.astype(np.float64) - fid.astype(np.float64))
        assert np.quantile(dev, 0.99) < bound, (lvl, np.quantile(dev, 0.99))


def test_full_stylized_distribution_recorded(setup):
    """Full 5-level alpha=0.8 vs oracle: calibrated distribution check.

    NOT a tightness claim — DESIGN §2b proves any composed-cascade
    cross-solver comparison measures mask flips (15× of the median)
    plus ~100× cascade amplification of per-level fp tolerance, not
    implementation error. The gate pins the distribution so a real
    regression (e.g. a broken level) still fails loudly; the TIGHT
    claims live in the per-level and matched-mask gates above.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade
    from wct_tpu.tools.oracle import cascade_np

    params, content, style = setup
    cfg = cascade.CascadeConfig()
    ours = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg))
    ref = cascade_np(params, content, style, 0.8, cfg.relu_targets)
    d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
    # Measured (160px, r4 RMS bundle): median 3.7e-3, q99 2.2e-2,
    # frac>0.05 1e-4 — the clean spectrum makes even the UNMATCHED
    # comparison nearly oracle-tight (r3: median 0.108, frac 0.733).
    assert np.median(d) < 2e-2, f"median {np.median(d):.3f}"
    assert (d > 0.05).mean() < 0.05, f"frac {(d > 0.05).mean():.3f}"

    # The HEADLINE config's full-cascade composition, same treatment —
    # catches a cross-level regression specific to NS-fast/pack2.
    def run(c):
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), c
        )
        c2 = jnp.asarray(np.stack([content, content]))
        return np.asarray(
            cascade.stylize(params, c2, cache, 0.8, c)[0], np.float32
        )

    fid = run(cascade.CascadeConfig(compute_dtype="float32", method="eigh"))
    fast = run(cascade.CascadeConfig(
        compute_dtype="bfloat16", method="newton_schulz_fast",
        pack2_junction=True))
    dev = np.abs(fast.astype(np.float64) - fid.astype(np.float64))
    # Measured (r4 RMS bundle): throughput-vs-fidelity composed median
    # 8.0e-2 (r3: 0.220) — bf16 rounding amplified by the cascade;
    # the per-level gates above bound the attributable part.
    assert np.median(dev) < 0.2, f"median {np.median(dev):.3f}"
    assert (dev > 0.05).mean() < 0.9, f"frac {(dev > 0.05).mean():.3f}"


def test_decoder_reconstruction_psnr_floors(setup):
    """Each trained decoder inverts the encoder on held-out images.

    Floors ≈3 dB under measured (calibration script, size 160) so
    regressions fail loudly while fp/platform jitter passes. The 256px
    table lives in weights/README.md.
    """
    import jax.numpy as jnp

    from wct_tpu.models import decoder as dec_lib, vgg
    from wct_tpu.train.data import synthetic_image

    params, _, _ = setup
    rng = np.random.default_rng(424242)  # held-out: ≠ train pool seed
    batch = np.stack([synthetic_image(rng, SIZE) for _ in range(4)])
    jbatch = jnp.asarray(batch)

    # Measured (calibration, size 160, r4 RMS bundle): 51.1 / 35.8 /
    # 33.0 / 29.8 / 24.4 dB (r3: 52.0/30.7/27.4/20.4/14.7). Floors
    # ~3 dB under.
    floors = {
        "relu1_1": 48.0,
        "relu2_1": 32.5,
        "relu3_1": 30.0,
        "relu4_1": 26.5,
        "relu5_1": 21.0,
    }
    for target, floor in floors.items():
        assert target in params["decoders"], f"bundle lacks {target}"
        code = vgg.encode(params["encoder"], jbatch, target)
        decoded = np.asarray(
            dec_lib.decode(params["decoders"][target], code, target)
        )
        mse = np.mean(
            (np.clip(decoded, 0, 1).astype(np.float64) - batch) ** 2
        )
        psnr = 10 * np.log10(1.0 / mse)
        assert psnr >= floor, f"{target}: {psnr:.1f} dB < floor {floor}"


def test_adain_cascade_matches_oracle(setup):
    """Full 5-level AdaIN cascade vs float64 oracle (VERDICT r4 item 4).

    AdaIN has no eigendecomposition — no mask flips, no solver
    tolerance — so the trained-bundle comparison is tight: any cascade
    plumbing regression on the `--adain` path fails loudly. Measured
    (160px CPU, r4 RMS bundle): median 7.4e-7, q99 4.8e-6, max 2.3e-5.
    Bounds ~20×.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade
    from wct_tpu.tools.oracle import cascade_np

    params, content, style = setup
    cfg = cascade.CascadeConfig(transform="adain")
    ours = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg))
    ref = cascade_np(params, content, style, 0.8, cfg.relu_targets,
                     transform="adain")
    d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
    assert np.quantile(d, 0.99) < 1e-4, f"q99 {np.quantile(d, 0.99):.2e}"
    assert d.max() < 5e-4, f"max {d.max():.2e}"


def test_swap5_matched_mask_within_tolerance(setup):
    """relu5_1 style-swap under MATCHED masks vs the float64 oracle.

    The tight executable gate for the swap path with trained weights
    (VERDICT r4 item 4 / missing #3): force the float64 keep-counts
    into both whitenings (ops trunc_topk / oracle force_k) so what
    remains is patch-argmax agreement + eigensolver tolerance. Measured
    (160px CPU, r4 RMS bundle, k_c=k_s=99): median 4.6e-8, q99 2.3e-7,
    max 4.7e-7 — the f32 op picks the SAME patches as float64 at this
    seed. Bounds >=20x.
    """
    import jax.numpy as jnp

    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.ops import style_swap as swap_ops
    from wct_tpu.ops import wct as wct_ops
    from wct_tpu.tools.oracle import (
        decode_np, encode_np, wct_ranks_np, wct_style_swap_np,
    )

    params, content, style = setup
    lvl = "relu5_1"
    fc64 = encode_np(params["encoder"], content.astype(np.float64), lvl)
    fs64 = encode_np(params["encoder"], style.astype(np.float64), lvl)
    k_c, k_s = wct_ranks_np(fc64, fs64)

    fc32 = vgg.encode(params["encoder"], jnp.asarray(content)[None], lvl)[0]
    fs32 = vgg.encode(params["encoder"], jnp.asarray(style)[None], lvl)[0]
    w_c, mu_c = wct_ops.whitening_kernel(fc32, trunc_topk=k_c)
    w_s, k_col, mu_s = wct_ops.whiten_color_kernels(fs32, trunc_topk=k_s)
    h, w, c = fc32.shape
    flat_c = fc32.reshape(h * w, c)
    fc_white = ((flat_c - mu_c[None, :]) @ w_c).reshape(h, w, c)
    hs, ws = fs32.shape[0], fs32.shape[1]
    flat_s = fs32.reshape(hs * ws, c)
    fs_white = ((flat_s - mu_s[None, :]) @ w_s).reshape(hs, ws, c)
    swapped = swap_ops.style_swap(fc_white, fs_white, 0.6, 3, 1)
    colored = swapped.reshape(h * w, c) @ k_col + mu_s[None, :]
    f_sw = (0.8 * colored + 0.2 * flat_c).reshape(h, w, c)
    ours = np.clip(np.asarray(dec_lib.decode(
        params["decoders"][lvl], f_sw[None], lvl)[0], np.float64), 0, 1)

    f64 = wct_style_swap_np(fc64, fs64, 0.8, 0.6, 3, 1, force_k=(k_c, k_s))
    ref = np.clip(decode_np(params["decoders"][lvl], f64, lvl), 0, 1)
    d = np.abs(ours - ref)
    assert np.quantile(d, 0.99) < 1e-5, f"q99 {np.quantile(d, 0.99):.2e}"
    assert d.max() < 5e-5, f"max {d.max():.2e}"


def test_swap5_cascade_distribution(setup):
    """Full cascade with --swap5 vs oracle: calibrated tripwire.

    Exercises the CASCADE plumbing of the swap path (precompute_style's
    fs_white cache, _transform_level's swap branch) with trained
    weights — a transform-mode regression in cascade.py now fails.
    Unmatched masks (production value-threshold trunc), so the bound is
    the distribution form. Measured (160px CPU, r4 RMS bundle): median
    1.9e-3, q99 1.1e-2, frac>0.05 1e-4.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade
    from wct_tpu.tools.oracle import cascade_np

    params, content, style = setup
    cfg = cascade.CascadeConfig(swap5=True)
    ours = np.asarray(cascade.stylize_pair(
        params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg))
    ref = cascade_np(params, content, style, 0.8, cfg.relu_targets,
                     swap5=True)
    d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
    assert np.median(d) < 1e-2, f"median {np.median(d):.3e}"
    assert (d > 0.05).mean() < 0.05, f"frac {(d > 0.05).mean():.4f}"


def test_composed_cascade_matched_mask_tight(setup):
    """FULL 5-level cascade under MATCHED masks: the tight composed gate.

    Round-4 (VERDICT r3 item 4): the proven mechanism (DESIGN §2b —
    value-mask flips of f32 noise eigenvalues are the dominant
    cross-solver term) is used to pin the WHOLE pipeline, not just
    single levels: at every level the float64 oracle's keep-counts are
    forced into both the production f32 path (ops.wct trunc_topk) and
    the oracle (force_k), so what remains is per-level fp tolerance ×
    the cascade's amplification — measured median 3.3e-3, q99 1.9e-2,
    frac>0.05 = 0.0 (160px CPU, r4 RMS bundle; the r3 bundle measured
    1.3e-2 at 256px). The gate sits ~3× over measured, replacing
    reliance on the unmatched-median tripwire (which stays, tighter,
    above).
    """
    import jax.numpy as jnp

    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.ops import wct as wct_ops
    from wct_tpu.tools.oracle import (
        decode_np, encode_np, wct_np, wct_ranks_np,
    )

    params, content, style = setup
    alpha = 0.8
    img_np = content.astype(np.float64)
    img_j = jnp.asarray(content)
    style64 = style.astype(np.float64)
    for lvl in ("relu5_1", "relu4_1", "relu3_1", "relu2_1", "relu1_1"):
        fc64 = encode_np(params["encoder"], img_np, lvl)
        fs64 = encode_np(params["encoder"], style64, lvl)
        k_c, k_s = wct_ranks_np(fc64, fs64)
        f64 = wct_np(fc64, fs64, alpha, force_k=(k_c, k_s))
        img_np = decode_np(params["decoders"][lvl], f64, lvl)

        fc32 = vgg.encode(params["encoder"], img_j[None], lvl)[0]
        fs32 = vgg.encode(params["encoder"], jnp.asarray(style)[None], lvl)[0]
        f32 = wct_ops.wct(fc32, fs32, alpha, trunc_topk=(k_c, k_s))
        img_j = dec_lib.decode(params["decoders"][lvl], f32[None], lvl)[0]

    ours = np.clip(np.asarray(img_j, np.float64), 0, 1)
    ref = np.clip(img_np, 0, 1)
    d = np.abs(ours - ref)
    assert np.median(d) < 1e-2, f"median {np.median(d):.3e}"
