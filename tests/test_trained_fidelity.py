"""Fidelity gates with TRAINED weights — the executable tolerance story.

Round 1's fidelity evidence used random weights and loose
distribution-body bounds. With the shipped trained bundle
(weights/bundle.npz) the gates become hard where the math allows and
honestly-calibrated where it does not. All bounds below were measured
by ``scripts/calibrate_trained_gates.py`` on the shipped bundle
(2026-08-18, size 96, CPU — the environment this suite runs in) and
set with explicit margin; measured values are quoted per gate.

What the math allows (and what it does not): with alpha=0 the cascade
is five pure encode→decode round trips — no eigendecomposition — and
the compiled pipeline agrees with the float64 numpy oracle to ~1e-4
end-to-end (gate 1). With stylization ON, each level's WCT rank
truncation (keep S > 1e-5, reference ops.py:~100) is a knife edge: a
single mode flipping in or out of the mask between two legitimate
eigensolvers changes that level's transform O(1), and subsequent
levels amplify it — so even the f32+eigh path vs the float64 oracle
saturates at the clip rails on ~half the pixels of a FULL 5-level
stylization (measured; both are "correct" stylizations, they differ in
near-degenerate eigendirections — ``--soft-trunc`` exists for exactly
this). The per-LEVEL comparison is the sharp claim: each single-level
stylization matches the oracle within eigensolver tolerance (gate 2),
which is the BASELINE north-star clause made executable.
"""

from pathlib import Path

import numpy as np
import pytest

BUNDLE = Path(__file__).resolve().parent.parent / "weights" / "bundle.npz"

pytestmark = pytest.mark.skipif(
    not BUNDLE.exists(),
    reason="trained bundle weights/bundle.npz not present",
)

SIZE = 96  # %16-aligned so the pack2/fused eligibility gates admit it


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
    Measured: median 7.0e-6, q99 4.4e-5, max 9.9e-5. Bounds 20–50×.
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
    assert np.quantile(d, 0.99) < 1e-3, f"q99 {np.quantile(d, 0.99):.2e}"
    assert d.max() < 5e-3, f"max {d.max():.2e}"


def test_single_level_within_eigensolver_tolerance(setup):
    """Per-level stylization (f32+eigh) vs float64 oracle at alpha=0.8.

    THE north-star clause ("output matching reference stylize.py
    pixel-wise within eigensolver tolerance"), executable: one level =
    one encode → one WCT (eigh, trunc, blend) → one decode, no
    cross-level chaos. Measured q99 per level: 8.7e-6 / 6.2e-5 /
    1.3e-5; max ≤ 2.0e-4. Bounds ~15–100×.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade
    from wct_tpu.tools.oracle import cascade_np

    params, content, style = setup
    # relu4_1 at this test size is rank-deficient (144 pixels vs 512
    # channels → the truncation mask bites): measured q99 1.7e-3, own
    # looser bound. relu5_1 is NOT gated: its 6×6×512 features drive
    # the 8-dB decoder so far out of range that every config clips to
    # identical rails (measured deviation exactly 0 — vacuous).
    bounds = {
        "relu1_1": (1e-3, 5e-3),
        "relu2_1": (1e-3, 5e-3),
        "relu3_1": (1e-3, 5e-3),
        "relu4_1": (1e-2, 3e-2),
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


def test_throughput_config_single_level_deviation(setup):
    """bf16 + NS-fast + pack2 (the headline config) vs f32+eigh, per level.

    Bounds the throughput path's pixel deviation where it is
    attributable (single level, no cross-level amplification).
    Measured q99: relu1_1 2.5e-2, relu2_1 5.3e-2, relu3_1 1.2e-1 —
    bf16 feature-map rounding dominates (≈8e-3 relative per conv),
    growing with channel count. Bounds ~2–4×.
    """
    import jax.numpy as jnp

    from wct_tpu.models import cascade

    params, content, style = setup
    bounds = {"relu1_1": 0.1, "relu2_1": 0.15, "relu3_1": 0.3,
              "relu4_1": 0.4}  # relu4_1 measured 2.1e-1; relu5_1 vacuous

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

    NOT a tightness claim — see the module docstring for why any full
    stylized comparison saturates at the clip rails in near-degenerate
    eigendirections (measured: median 9.9e-2, 58% of pixels > 0.05,
    with the f32+eigh-vs-oracle envelope itself at 58%). The gate
    pins the distribution so a real regression (e.g. a broken level)
    still fails loudly.
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
    assert np.median(d) < 0.2, f"median {np.median(d):.3f}"
    assert (d > 0.05).mean() < 0.75, f"frac {(d > 0.05).mean():.3f}"

    # The HEADLINE config's full-cascade composition, same treatment
    # (measured vs the f32+eigh full cascade: median 0.236, frac 0.72)
    # — catches a cross-level regression specific to NS-fast/pack2.
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
    assert np.median(dev) < 0.4, f"median {np.median(dev):.3f}"
    assert (dev > 0.05).mean() < 0.85, f"frac {(dev > 0.05).mean():.3f}"


def test_decoder_reconstruction_psnr_floors(setup):
    """Each trained decoder inverts the encoder on held-out images.

    Floors ≈3 dB under measured (calibration script, size 96:
    16.7 / 12.4 / 10.8 / 12.7 / 10.6 dB) so regressions fail loudly
    while fp/platform jitter passes. The 256px table lives in
    weights/README.md.
    """
    import jax.numpy as jnp

    from wct_tpu.models import decoder as dec_lib, vgg
    from wct_tpu.train.data import synthetic_image

    params, _, _ = setup
    rng = np.random.default_rng(424242)  # held-out: ≠ train pool seed
    batch = np.stack([synthetic_image(rng, SIZE) for _ in range(4)])
    jbatch = jnp.asarray(batch)

    floors = {
        "relu1_1": 13.5,
        "relu2_1": 9.5,
        "relu3_1": 8.0,
        "relu4_1": 9.5,
        "relu5_1": 7.5,
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
