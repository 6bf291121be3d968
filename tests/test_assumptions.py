"""The `[verify]` assumption ledger (VERDICT r1, next-round item 4).

Every load-bearing assumption about the reference's semantics — made
while `/root/reference/` was empty (SURVEY.md provenance note) — is
pinned here as ONE individually-named test with an independent inline
numpy formulation (no reuse of wct_tpu's own helper math, so a shared
misreading cannot pass silently). Each test cites the SURVEY anchor it
pins. The day the real reference lands and `scripts/verify_reference.py`
finds a divergence, the diff maps one-to-one onto failing tests here:
fix the implementation, and the matching test, together.

Discriminating tests assert BOTH that our choice holds AND that the
plausible alternative reading does NOT (e.g. blend-vs-uncentered also
checks the centered variant differs), so the ledger can't be satisfied
by math that accidentally matches every reading.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.models import cascade, decoder as dec_lib, vgg
from wct_tpu.ops import adain as adain_ops
from wct_tpu.ops import style_swap as swap_ops
from wct_tpu.ops import wct as wct_ops


@pytest.fixture
def feats(rng):
    """Well-conditioned content/style features, C=6."""
    fc = rng.standard_normal((8, 9, 6)).astype(np.float32)
    fs = (rng.standard_normal((7, 5, 6)) * 2.0 + 1.0).astype(np.float32)
    return fc, fs


def _np_cov(flat: np.ndarray, eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Reference Gram: mean-center, divide by N−1, add eps·I (ops.py:~80)."""
    mu = flat.mean(0)
    x = (flat - mu).astype(np.float64)
    return x.T @ x / (flat.shape[0] - 1) + eps * np.eye(flat.shape[1]), mu


# ---------------------------------------------------------------------------
# A1. eps = 1e-8, applied to the GRAM diagonal (not the eigenvalues)
#     — reference ops.py:~70 (SURVEY §A.2 "cov + ε I, ε ≈ 1e−8")
# ---------------------------------------------------------------------------


def test_a1_eps_value_and_placement_on_gram(feats):
    fc, _ = feats
    flat = fc.reshape(-1, 6)
    cov, mu = _np_cov(flat, 1e-8)
    s, u = np.linalg.eigh(cov)
    want = (u * np.where(s > 1e-5, s**-0.5, 0.0)) @ u.T

    got, got_mu = wct_ops.whitening_kernel(jnp.asarray(fc))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_mu), mu, atol=1e-5)
    # Discriminator: a markedly different eps (1e-3) must NOT match —
    # proves the test is sensitive to the eps assumption at all.
    cov_alt, _ = _np_cov(flat, 1e-3)
    s2, u2 = np.linalg.eigh(cov_alt)
    alt = (u2 * np.where(s2 > 1e-5, s2**-0.5, 0.0)) @ u2.T
    assert np.abs(np.asarray(got) - alt).max() > 1e-4


# ---------------------------------------------------------------------------
# A2. rank truncation: HARD mask, keep eigenvalues > 1e-5
#     — reference ops.py:~95 "k_c = #{S_c > 1e-5}" (SURVEY §A.2)
# ---------------------------------------------------------------------------


def test_a2_hard_truncation_at_1e5(rng):
    # rank-3 features in C=6: three zero eigenvalues land at ~eps=1e-8,
    # below the 1e-5 threshold → those modes must contribute EXACTLY 0.
    basis = rng.standard_normal((3, 6)).astype(np.float32)
    flat = (rng.standard_normal((64, 3)).astype(np.float32) @ basis)
    fc = flat.reshape(8, 8, 6)

    got = np.asarray(wct_ops.whitening_kernel(jnp.asarray(fc))[0])
    cov, _ = _np_cov(flat, 1e-8)
    s, u = np.linalg.eigh(cov)
    kept = s > 1e-5
    assert kept.sum() == 3, s  # the physical rank
    want = (u * np.where(kept, np.abs(s) ** -0.5, 0.0)) @ u.T
    np.testing.assert_allclose(got, want, atol=1e-3)
    # null-space annihilation: kernel maps null directions to ~0
    null = u[:, ~kept]
    assert np.abs(got @ null).max() < 1e-2  # vs ~1/sqrt(1e-8)=1e4 if kept


# ---------------------------------------------------------------------------
# A3. blend against the UNCENTERED original content:
#     out = α·((fc − μc)·T + μs) + (1−α)·fc    — reference ops.py:~135
#     ([verify: blend against uncentered fc], SURVEY §3.4)
# ---------------------------------------------------------------------------


def test_a3_blend_vs_uncentered_content(feats):
    fc, fs = feats
    alpha = 0.37
    got = np.asarray(
        wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), alpha)
    ).reshape(-1, 6)

    flatc = fc.reshape(-1, 6).astype(np.float64)
    flats = fs.reshape(-1, 6).astype(np.float64)
    cov_c, mu_c = _np_cov(flatc, 1e-8)
    cov_s, mu_s = _np_cov(flats, 1e-8)
    sc, ucv = np.linalg.eigh(cov_c)
    ss, usv = np.linalg.eigh(cov_s)
    w_c = (ucv * np.where(sc > 1e-5, sc**-0.5, 0.0)) @ ucv.T
    k_s = (usv * np.where(ss > 1e-5, ss**0.5, 0.0)) @ usv.T
    fcs = (flatc - mu_c) @ w_c @ k_s + mu_s

    uncentered = alpha * fcs + (1 - alpha) * flatc
    centered = alpha * fcs + (1 - alpha) * (flatc - mu_c)
    np.testing.assert_allclose(got, uncentered, atol=1e-3)
    # the alternative reading must NOT match
    assert np.abs(got - centered).max() > 1e-2


# ---------------------------------------------------------------------------
# A4. Gram divisor is N−1 (not N) — reference ops.py:~80 "ff^T/(HW−1)"
# ---------------------------------------------------------------------------


def test_a4_gram_divisor_n_minus_1(rng):
    flat = rng.standard_normal((12, 4)).astype(np.float32)
    fs = flat.reshape(3, 4, 4)
    stats = wct_ops.style_stats(jnp.asarray(fs))
    got_cov = np.asarray(stats.kernel, np.float64) @ np.asarray(
        stats.kernel, np.float64
    )  # kernel = cov^{1/2} → kernel² = cov (+eps, all modes kept here)

    for div, should_match in ((flat.shape[0] - 1, True), (flat.shape[0], False)):
        mu = flat.mean(0)
        x = (flat - mu).astype(np.float64)
        cov = x.T @ x / div + 1e-8 * np.eye(4)
        if should_match:
            np.testing.assert_allclose(got_cov, cov, atol=1e-4)
        else:
            assert np.abs(got_cov - cov).max() > 1e-3


# ---------------------------------------------------------------------------
# A5. the style MEAN is re-added after coloring (μs term) — ops.py:~120
# ---------------------------------------------------------------------------


def test_a5_style_mean_readded(feats):
    fc, fs = feats
    fs = fs + 3.0  # large style mean so the term is unmissable
    out = np.asarray(wct_ops.wct(jnp.asarray(fc), jnp.asarray(fs), 1.0))
    mu_s = fs.reshape(-1, 6).mean(0)
    np.testing.assert_allclose(out.reshape(-1, 6).mean(0), mu_s, atol=0.05)


# ---------------------------------------------------------------------------
# A6. AdaIN: eps = 1e-5 INSIDE the variance rsqrt; exact form
#     σs·(x−μc)/√(σc²+ε) + μs — reference ops.py:~40–60 (SURVEY C2)
# ---------------------------------------------------------------------------


def test_a6_adain_form_and_eps(feats):
    fc, fs = feats
    got = np.asarray(adain_ops.adain(jnp.asarray(fc), jnp.asarray(fs), 1.0))

    c64 = fc.reshape(-1, 6).astype(np.float64)
    s64 = fs.reshape(-1, 6).astype(np.float64)
    mu_c, var_c = c64.mean(0), c64.var(0)
    mu_s, var_s = s64.mean(0), s64.var(0)
    want = (
        np.sqrt(var_s + 1e-5) * (c64 - mu_c) / np.sqrt(var_c + 1e-5) + mu_s
    ).reshape(fc.shape)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# A7. interpolation = feature-space blend Σ wk·color_k(f̂c)
#     — webcam.py --interpolate ([verify] SURVEY C13 / §A.2)
# ---------------------------------------------------------------------------


def test_a7_interpolation_equals_feature_space_blend(feats, rng):
    fc, fs1 = feats
    fs2 = (rng.standard_normal((6, 6, 6)) * 0.5 - 1.0).astype(np.float32)
    w = jnp.asarray([0.3, 0.7])

    st1 = wct_ops.style_stats(jnp.asarray(fs1))
    st2 = wct_ops.style_stats(jnp.asarray(fs2))
    blended = wct_ops.interpolate_stats([st1, st2], w)
    got = np.asarray(wct_ops.wct_from_stats(jnp.asarray(fc), blended, 1.0))

    # independent: whiten once, color per style, blend the FEATURES
    out1 = np.asarray(wct_ops.wct_from_stats(jnp.asarray(fc), st1, 1.0))
    out2 = np.asarray(wct_ops.wct_from_stats(jnp.asarray(fc), st2, 1.0))
    want = 0.3 * out1 + 0.7 * out2
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# A8. conv0 preprocessing: RGB[0,1] ×255 → BGR − ImageNet means
#     — reference model.py:~40, first t7 conv ([verify exact scaling])
# ---------------------------------------------------------------------------


def test_a8_conv0_preprocessing_constants():
    params = vgg.init_encoder_params(jax.random.PRNGKey(0))
    pixel = jnp.asarray([[[0.2, 0.5, 0.9]]], jnp.float32)  # RGB
    w, b = params["conv0"]["w"], params["conv0"]["b"]
    out = np.asarray(
        jax.lax.conv_general_dilated(
            pixel[None], w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, 0, 0] + b
    )
    want = np.array(
        [0.9 * 255 - 103.939, 0.5 * 255 - 116.779, 0.2 * 255 - 123.68],
        np.float32,
    )  # BGR order, ImageNet means
    np.testing.assert_allclose(out, want, atol=1e-3)


# ---------------------------------------------------------------------------
# A9. decoder mirrors the encoder: NN-upsample ×2 per pool, 3×3 reflect
#     convs + ReLU, FINAL conv → 3 channels LINEAR — model.py:~85–140
# ---------------------------------------------------------------------------


def test_a9_decoder_mirror_structure():
    layers = dec_lib.decoder_layers("relu5_1")
    convs = [s for s in layers if s[0] == "conv"]
    ups = [s for s in layers if s[0] == "upsample"]
    assert len(ups) == 4  # one per pool between relu5_1 and pixels
    assert len(convs) == 13  # mirror of conv5_1..conv1_1 + output conv
    # final conv emits 3 channels; every conv is 3×3
    assert convs[-1][3] == 3
    assert all(s[4] == 3 for s in convs)
    # channel path mirrors the encoder's (512→…→64→3)
    assert [s[2] for s in convs[:2]] == [512, 512]
    assert convs[-2][2] == 64

    # LINEAR final conv + NN upsample, behaviorally: a relu1_1 decode of
    # features engineered to produce negative outputs must KEEP them
    # negative (ReLU on the last conv would clamp).
    params = dec_lib.init_decoder_params(jax.random.PRNGKey(1), "relu1_1")
    last = [s[1] for s in dec_lib.decoder_layers("relu1_1") if s[0] == "conv"][-1]
    params[last]["b"] = params[last]["b"] - 100.0
    f = jnp.ones((1, 4, 4, 64), jnp.float32)
    out = np.asarray(dec_lib.decode(params, f, "relu1_1"))
    assert (out < 0).all()


def test_a9b_upsample_is_nearest_neighbor(rng):
    # relu2_1 decoder contains exactly one upsample; NN-upsample means
    # each 2×2 block of its output conv's INPUT repeats one value.
    # Pin via the public decode path with identity-ish single conv:
    from wct_tpu.ops.convs import upsample_nearest2

    x = jnp.asarray(rng.standard_normal((1, 3, 4, 2)), jnp.float32)
    up = np.asarray(upsample_nearest2(x))
    assert up.shape == (1, 6, 8, 2)
    np.testing.assert_array_equal(up[0, ::2, ::2], np.asarray(x)[0])
    np.testing.assert_array_equal(up[0, 1::2, ::2], np.asarray(x)[0])
    np.testing.assert_array_equal(up[0, ::2, 1::2], np.asarray(x)[0])


# ---------------------------------------------------------------------------
# A10. cascade order relu5_1→relu1_1; ONE clip before save (no clip
#      between levels) — stylize.py:~150 / model.py test graph (C7)
# ---------------------------------------------------------------------------


def test_a10_cascade_order_and_single_final_clip():
    assert cascade.DEFAULT_TARGETS == (
        "relu5_1", "relu4_1", "relu3_1", "relu2_1", "relu1_1"
    )
    assert cascade.CascadeConfig().clip_between_levels is False


def test_a10b_intermediate_levels_flow_unclipped(rng):
    """A mid-cascade decode > 1.0 must reach the next encoder unclipped.

    Discriminating setup: relu1_1 decoder bias pushed to +10 so the
    FIRST level's decode is out of range. With reference semantics the
    second level sees 10-ish inputs; with clip-between-levels it would
    see 1.0 exactly. Compare against manually clipping: outputs differ.
    """
    targets = ("relu2_1", "relu1_1")
    params = cascade.init_params(jax.random.PRNGKey(0), targets)
    last2 = [s[1] for s in dec_lib.decoder_layers("relu2_1") if s[0] == "conv"][-1]
    params["decoders"]["relu2_1"][last2]["b"] = (
        params["decoders"]["relu2_1"][last2]["b"] + 10.0
    )
    content = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    style = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)

    cfg = cascade.CascadeConfig(relu_targets=targets)
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    out = np.asarray(cascade.stylize(params, content, cache, 1.0, cfg))

    cfg_clip = cascade.CascadeConfig(relu_targets=targets, clip_between_levels=True)
    out_clip = np.asarray(cascade.stylize(params, content, cache, 1.0, cfg_clip))
    assert np.abs(out - out_clip).max() > 1e-3  # the two semantics differ
    assert out.min() >= 0.0 and out.max() <= 1.0  # final clip still applies


# ---------------------------------------------------------------------------
# A11. style-swap: NCC argmax picks the best style patch; reconstruction
#      uses UN-normalized patches with overlap averaging — ops.py:~145–230
#      ([verify exact trick] SURVEY C4)
# ---------------------------------------------------------------------------


def test_a11_style_swap_ncc_argmax_patch1(rng):
    """patch_size=1: swap reduces to per-pixel nearest style pixel by
    normalized correlation — checkable against a trivial numpy loop."""
    fc = rng.standard_normal((4, 4, 3)).astype(np.float32)
    fs = rng.standard_normal((3, 3, 3)).astype(np.float32)
    got = np.asarray(
        swap_ops.style_swap(jnp.asarray(fc), jnp.asarray(fs), 1.0, 1, 1)
    )
    sp = fs.reshape(-1, 3)
    spn = sp / np.maximum(np.linalg.norm(sp, axis=1, keepdims=True), 1e-8)
    for i in range(4):
        for j in range(4):
            corr = spn @ fc[i, j]
            np.testing.assert_allclose(
                got[i, j], sp[np.argmax(corr)], atol=1e-5,
                err_msg=f"pixel {(i, j)} swapped to the wrong style pixel",
            )


def test_a11b_style_swap_overlap_average(rng):
    """patch_size=2, stride=1 on a flat content: every output position
    is the average of the (un-normalized) winning patches covering it —
    counts-normalized deconv, not sum."""
    fc = np.ones((3, 3, 2), np.float32)
    fs = rng.standard_normal((4, 4, 2)).astype(np.float32)
    got = np.asarray(
        swap_ops.style_swap(jnp.asarray(fc), jnp.asarray(fs), 1.0, 2, 1)
    )
    # independent reconstruction
    patches = []
    for i in range(3):
        for j in range(3):
            patches.append(fs[i : i + 2, j : j + 2].reshape(-1))
    patches = np.stack(patches)  # [9, 8]
    norm = patches / np.maximum(
        np.linalg.norm(patches, axis=1, keepdims=True), 1e-8
    )
    acc = np.zeros((3, 3, 2)); cnt = np.zeros((3, 3, 1))
    for ci in range(2):
        for cj in range(2):
            cpatch = fc[ci : ci + 2, cj : cj + 2].reshape(-1)
            best = patches[np.argmax(norm @ cpatch)].reshape(2, 2, 2)
            acc[ci : ci + 2, cj : cj + 2] += best
            cnt[ci : ci + 2, cj : cj + 2] += 1
    want = acc / cnt
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# A12. tf.svd(PSD) ≡ eigh rationale: whiten/color products invariant to
#      eigenvector sign flips & degenerate rotations — SURVEY §3.4 note
# ---------------------------------------------------------------------------


def test_a12_products_invariant_to_eigenvector_sign(rng):
    flat = rng.standard_normal((50, 5)).astype(np.float64)
    cov = flat.T @ flat / 49 + 1e-8 * np.eye(5)
    s, u = np.linalg.eigh(cov)
    for _ in range(4):
        signs = np.sign(rng.standard_normal(5))
        u2 = u * signs
        a = (u * s**-0.5) @ u.T
        b = (u2 * s**-0.5) @ u2.T
        np.testing.assert_allclose(a, b, atol=1e-12)


# ---------------------------------------------------------------------------
# A13. reflect padding on EVERY conv (encoder & decoder) — ops.py:~10–35
# ---------------------------------------------------------------------------


def test_a13_reflect_padding_not_zero_pad(rng):
    from wct_tpu.ops.convs import conv2d_reflect

    x = jnp.asarray(rng.standard_normal((1, 5, 5, 1)), jnp.float32)
    w = jnp.ones((3, 3, 1, 1), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)
    got = np.asarray(conv2d_reflect(x, w, b))[0, :, :, 0]
    xp = np.pad(np.asarray(x)[0, :, :, 0], 1, mode="reflect")
    want = np.zeros((5, 5))
    for i in range(5):
        for j in range(5):
            want[i, j] = xp[i : i + 3, j : j + 3].sum()
    np.testing.assert_allclose(got, want, atol=1e-4)
    # discriminator: zero-padding gives different borders
    xz = np.pad(np.asarray(x)[0, :, :, 0], 1, mode="constant")
    wz = np.zeros((5, 5))
    for i in range(5):
        for j in range(5):
            wz[i, j] = xz[i : i + 3, j : j + 3].sum()
    assert np.abs(want - wz).max() > 1e-4
