"""Style-swap tests: patch extraction, self-swap identity, full op."""

import jax.numpy as jnp
import numpy as np

from wct_tpu.ops import style_swap as swap_ops


def test_extract_patches_ordering(rng):
    f = rng.standard_normal((5, 6, 2)).astype(np.float32)
    patches = np.asarray(swap_ops.extract_patches(jnp.asarray(f), 3, 1))
    assert patches.shape == (3, 3, 2, 3 * 4)
    # Patch p = (i, j) in row-major over a 3×4 grid.
    for p, (i, j) in enumerate((i, j) for i in range(3) for j in range(4)):
        np.testing.assert_array_equal(
            patches[..., p], f[i : i + 3, j : j + 3, :]
        )


def test_extract_patches_stride2(rng):
    f = rng.standard_normal((7, 7, 1)).astype(np.float32)
    patches = np.asarray(swap_ops.extract_patches(jnp.asarray(f), 3, 2))
    assert patches.shape == (3, 3, 1, 9)
    np.testing.assert_array_equal(patches[..., 4], f[2:5, 2:5, :])


def test_self_swap_is_identity(rng):
    # Swapping content against itself must reproduce it: each patch's
    # best match is itself, and overlap-averaging of the identical
    # patches reconstructs the input.
    f = rng.standard_normal((8, 8, 4)).astype(np.float32)
    out = swap_ops.style_swap(jnp.asarray(f), jnp.asarray(f), ss_alpha=1.0)
    np.testing.assert_allclose(np.asarray(out), f, atol=1e-4)


def test_ss_alpha_zero_identity(rng):
    fc = rng.standard_normal((8, 8, 4)).astype(np.float32)
    fs = rng.standard_normal((8, 8, 4)).astype(np.float32)
    out = swap_ops.style_swap(jnp.asarray(fc), jnp.asarray(fs), ss_alpha=0.0)
    np.testing.assert_allclose(np.asarray(out), fc, atol=1e-5)


def test_wct_style_swap_finite_and_styled(rng):
    fc = rng.standard_normal((8, 8, 6)).astype(np.float32)
    fs = (rng.standard_normal((8, 8, 6)) * 2 + 1).astype(np.float32)
    out = np.asarray(
        swap_ops.wct_style_swap(jnp.asarray(fc), jnp.asarray(fs), 1.0, 0.7)
    )
    assert out.shape == fc.shape
    assert np.all(np.isfinite(out))
    # Colored output should carry the style mean.
    np.testing.assert_allclose(
        out.reshape(-1, 6).mean(0), fs.reshape(-1, 6).mean(0), atol=0.5
    )


def test_stride2_shapes(rng):
    fc = rng.standard_normal((9, 9, 4)).astype(np.float32)
    fs = rng.standard_normal((9, 9, 4)).astype(np.float32)
    out = swap_ops.style_swap(jnp.asarray(fc), jnp.asarray(fs), 1.0, 3, 2)
    assert out.shape == fc.shape


def test_style_swap_matches_float64_oracle(rng):
    """ops.style_swap vs tools.oracle.style_swap_np (VERDICT r4 item 4).

    Random continuous features make argmax ties measure-zero, so the
    f32 op and the f64 oracle must pick the SAME patches and differ
    only by fp rounding of the reconstruction.
    """
    from wct_tpu.tools.oracle import style_swap_np

    for shape_c, shape_s, stride in (
        ((8, 8, 4), (8, 8, 4), 1),
        ((10, 9, 6), (7, 8, 6), 1),
        ((9, 9, 4), (9, 9, 4), 2),
    ):
        fc = rng.standard_normal(shape_c).astype(np.float32)
        fs = rng.standard_normal(shape_s).astype(np.float32)
        ours = np.asarray(
            swap_ops.style_swap(jnp.asarray(fc), jnp.asarray(fs), 0.7, 3, stride)
        )
        ref = style_swap_np(fc, fs, 0.7, 3, stride)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_wct_style_swap_matches_float64_oracle(rng):
    """Full whiten→swap→color op vs the float64 oracle, full-rank case."""
    from wct_tpu.tools.oracle import wct_style_swap_np

    fc = rng.standard_normal((12, 12, 6)).astype(np.float32)
    fs = (rng.standard_normal((10, 11, 6)) * 1.5 + 0.3).astype(np.float32)
    ours = np.asarray(
        swap_ops.wct_style_swap(jnp.asarray(fc), jnp.asarray(fs), 0.8, 0.6)
    )
    ref = wct_style_swap_np(fc, fs, 0.8, 0.6)
    # 144 px vs 6 ch: full-rank Gram, no mask flips; deviation is pure
    # f32-vs-f64 eigensolver tolerance.
    d = np.abs(ours.astype(np.float64) - ref)
    assert np.quantile(d, 0.99) < 1e-3, np.quantile(d, 0.99)
    assert d.max() < 5e-3, d.max()


def test_oracle_self_swap_identity(rng):
    """The numpy oracle holds the same invariants as the op."""
    from wct_tpu.tools.oracle import style_swap_np

    f = rng.standard_normal((8, 8, 4))
    np.testing.assert_allclose(style_swap_np(f, f, 1.0), f, atol=1e-10)
    fs = rng.standard_normal((8, 8, 4))
    np.testing.assert_allclose(style_swap_np(f, fs, 0.0), f, atol=1e-12)
