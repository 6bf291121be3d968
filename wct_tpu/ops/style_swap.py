"""Style-swap: patch-level nearest-neighbor substitution in whitened space.

Reimplements WCT-TF's ``wct_style_swap`` (reference ops.py:~145–230,
reconstructed — SURVEY.md C4; algorithm from Chen & Schmidt 2016,
enabled at relu5_1 by the reference's ``--swap5`` flag):

1. whiten content AND style features (shared whitened space),
2. extract style patches, L2-normalize them as conv filters,
3. convolve: correlation of every content location with every patch,
4. hard argmax over patches → one-hot,
5. transposed-conv with the UN-normalized patches reconstructs the
   nearest-style-patch collage; divide by per-pixel overlap counts,
6. blend with the whitened content by ``ss_alpha``, then color with the
   style statistics and alpha-blend as usual.

TPU notes: patch extraction is stacked shifted slices (pure data
movement, no gather); the correlation and the reconstruction are both
single large convs (MXU); argmax one-hot is ``jax.nn.one_hot`` on a
[Hc', Wc', P] map (VPU). The transposed conv is expressed as an
input-dilated conv with spatially flipped filters so only
``conv_general_dilated`` — XLA's best-tuned TPU op — is used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wct_tpu.ops import reductions
from wct_tpu.ops import wct as wct_ops

_DN = ("NHWC", "HWIO", "NHWC")


def extract_patches(f: jax.Array, patch_size: int, stride: int) -> jax.Array:
    """Patches of ``f: [H, W, C]`` → filter bank ``[ps, ps, C, P]``.

    P = Hp·Wp patches in row-major order, Hp = (H−ps)//stride + 1.
    Built from ps² shifted strided views — explicit ordering, no
    dependence on conv_general_dilated_patches' channel layout.
    """
    h, w, c = f.shape
    ps = patch_size
    hp = (h - ps) // stride + 1
    wp = (w - ps) // stride + 1
    views = [
        [f[di : di + (hp - 1) * stride + 1 : stride,
           dj : dj + (wp - 1) * stride + 1 : stride, :]
         for dj in range(ps)]
        for di in range(ps)
    ]
    stacked = jnp.stack([jnp.stack(row, axis=0) for row in views], axis=0)
    # [ps, ps, Hp, Wp, C] → [ps, ps, C, Hp*Wp]
    return stacked.transpose(0, 1, 4, 2, 3).reshape(ps, ps, c, hp * wp)


def _deconv_patches(
    one_hot: jax.Array, filters: jax.Array, stride: int
) -> jax.Array:
    """Transposed conv of ``one_hot [1,Hc',Wc',P]`` with ``filters [ps,ps,C,P]``.

    Expressed as an input-dilated correlation with spatially flipped
    filters: out[x+di, y+dj, c] += one_hot[x, y, p] · patch_p[di, dj, c].
    """
    ps = filters.shape[0]
    w_flip = filters[::-1, ::-1].transpose(0, 1, 3, 2)  # [ps, ps, P, C]
    return jax.lax.conv_general_dilated(
        one_hot,
        w_flip.astype(one_hot.dtype),
        window_strides=(1, 1),
        padding=[(ps - 1, ps - 1), (ps - 1, ps - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )


def style_swap(
    fc_white: jax.Array,
    fs_white: jax.Array,
    ss_alpha: jax.Array | float = 0.6,
    patch_size: int = 3,
    stride: int = 1,
) -> jax.Array:
    """Swap whitened content patches for nearest whitened style patches.

    ``fc_white: [H, W, C]``, ``fs_white: [Hs, Ws, C]`` (already
    whitened). Returns ``[H, W, C]`` blended by ``ss_alpha`` (the
    reference's ``--ss-alpha``).
    """
    h, w, c = fc_white.shape
    ps = patch_size
    if min(h, w, fs_white.shape[0], fs_white.shape[1]) < ps:
        raise ValueError(
            f"style_swap needs feature maps ≥ patch_size={ps}; got content "
            f"{(h, w)}, style {fs_white.shape[:2]} — use a larger image or "
            f"smaller ss_patch_size"
        )

    filters = extract_patches(fs_white, ps, stride)  # [ps, ps, C, P]
    p = filters.shape[-1]
    # Patch norms as an MXU contraction (ops/reductions.py): a plain
    # sum is tiled batch-dependently by XLA, and a flipped ULP here can
    # swing the argmax between near-tied patches — breaking bitwise
    # batch stability.
    f32 = filters.astype(jnp.float32)
    norms = jnp.sqrt(reductions.sum0((f32 * f32).reshape(-1, p)))
    filters_n = filters / jnp.maximum(norms, 1e-8)[None, None, None, :]

    # Correlation of every content location with every style patch.
    corr = jax.lax.conv_general_dilated(
        fc_white[None].astype(jnp.float32),
        filters_n.astype(jnp.float32),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )  # [1, Hc', Wc', P]

    best = jnp.argmax(corr, axis=-1)
    one_hot = jax.nn.one_hot(best, p, dtype=jnp.float32)  # [1, Hc', Wc', P]

    recon = _deconv_patches(one_hot, filters.astype(jnp.float32), stride)
    counts = _deconv_patches(
        one_hot, jnp.ones_like(filters, dtype=jnp.float32), stride
    )
    recon = recon / jnp.maximum(counts, 1.0)

    # Reconstruction covers (Hc'−1)·stride + ps rows; edge-pad back to
    # H×W when stride does not tile the input exactly.
    hr, wr = recon.shape[1], recon.shape[2]
    if (hr, wr) != (h, w):
        recon = jnp.pad(
            recon, ((0, 0), (0, h - hr), (0, w - wr), (0, 0)), mode="edge"
        )
    recon = recon[0].astype(fc_white.dtype)

    ss_alpha = jnp.asarray(ss_alpha, dtype=jnp.float32).astype(fc_white.dtype)
    return ss_alpha * recon + (1.0 - ss_alpha) * fc_white


def wct_style_swap(
    fc: jax.Array,
    fs: jax.Array,
    alpha: jax.Array | float = 1.0,
    ss_alpha: jax.Array | float = 0.6,
    patch_size: int = 3,
    stride: int = 1,
    *,
    eps: float = wct_ops.DEFAULT_EPS,
    trunc: float = wct_ops.DEFAULT_TRUNC,
    method: wct_ops.Method = "eigh",
) -> jax.Array:
    """Full WCT-with-style-swap on raw features (reference ops.py:~145).

    whiten(c), whiten(s) → patch swap → color with style stats →
    alpha-blend against original content features.
    """
    h, w, c = fc.shape

    w_c, mu_c = wct_ops.whitening_kernel(fc, eps=eps, trunc=trunc, method=method)
    # One Gram + one decomposition yields the style's whitening AND
    # coloring kernels (this runs on the style-switch hot path).
    w_s, k_s, mu_s = wct_ops.whiten_color_kernels(
        fs, eps=eps, trunc=trunc, method=method
    )

    fc_flat = fc.reshape(h * w, c).astype(jnp.float32)
    fc_white = ((fc_flat - mu_c[None, :]) @ w_c).reshape(h, w, c)
    hs, ws = fs.shape[0], fs.shape[1]
    fs_flat = fs.reshape(hs * ws, c).astype(jnp.float32)
    fs_white = ((fs_flat - mu_s[None, :]) @ w_s).reshape(hs, ws, c)

    swapped = style_swap(fc_white, fs_white, ss_alpha, patch_size, stride)

    colored = (
        swapped.reshape(h * w, c) @ k_s.astype(jnp.float32)
        + mu_s.astype(jnp.float32)[None, :]
    )
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    out = alpha * colored + (1.0 - alpha) * fc_flat
    return out.reshape(h, w, c).astype(fc.dtype)
