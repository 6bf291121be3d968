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
