"""Tests for the closed-form layerwise decoder init (train/layerwise.py).

The reference has no counterpart (it trains decoders with Adam against
the real VGG — train.py:~1-200, reconstructed); this is round-3 scope:
ridge inversion of each mirror conv. These tests pin the patch-matrix ↔
conv-kernel ordering (the one place a silent transpose would corrupt
every solve), the regression wiring, and a tiny end-to-end solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.models import decoder as dec_lib
from wct_tpu.models import vgg
from wct_tpu.ops.convs import conv2d_reflect
from wct_tpu.train import layerwise


@pytest.fixture(scope="module")
def enc_params():
    return vgg.init_encoder_params(jax.random.PRNGKey(0))


class TestSpecs:
    def test_thirteen_regressions_cover_all_decoder_convs(self):
        specs = layerwise.regression_specs()
        assert len(specs) == 13
        names = {s["dec"] for s in specs}
        for t in vgg.RELU_TARGETS:
            for kind, name, *_ in dec_lib.decoder_layers(t):
                if kind == "conv":
                    assert name in names

    def test_conv1_1_targets_rgb(self):
        [s] = [s for s in layerwise.regression_specs() if s["conv"] == "conv1_1"]
        assert s["y_key"] == "input" and s["y_c"] == 3
        assert not s["x_pooled"]

    def test_pre_pool_convs_regress_from_upsampled_pool(self):
        by = {s["conv"]: s for s in layerwise.regression_specs()}
        for c, pool in [("conv1_2", "pool1"), ("conv2_2", "pool2"),
                        ("conv3_4", "pool3"), ("conv4_4", "pool4")]:
            assert by[c]["x_pooled"] and by[c]["pool_key"] == pool
        for c in ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"):
            assert not by[c]["x_pooled"]

    def test_post_pool_convs_target_the_pooled_map(self):
        by = {s["conv"]: s for s in layerwise.regression_specs()}
        assert by["conv2_1"]["y_key"] == "pool1" and by["conv2_1"]["y_c"] == 64
        assert by["conv5_1"]["y_key"] == "pool4" and by["conv5_1"]["y_c"] == 512


class TestPatches:
    def test_patch_matrix_reproduces_reflect_conv(self):
        """P @ w.reshape(-1, out) + b  ==  conv2d_reflect(x, w, b) — pins
        the (kh, kw, in) flattening order against the kernel layout."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 6, 7, 5)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 5, 4)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(4), jnp.float32)
        P = layerwise._patches(x, 3)
        assert P.shape == (2 * 6 * 7, 3 * 3 * 5 + 1)
        np.testing.assert_array_equal(np.asarray(P[:, -1]), 1.0)
        got = (P[:, :-1] @ w.reshape(-1, 4) + b).reshape(2, 6, 7, 4)
        want = conv2d_reflect(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestEncoderTrace:
    def test_all_layers_traced_with_expected_shapes(self, enc_params):
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        acts = layerwise.encoder_trace(enc_params, x)
        assert acts["input"].shape == (1, 32, 32, 3)
        assert acts["conv1_1"].shape == (1, 32, 32, 64)
        assert acts["pool1"].shape == (1, 16, 16, 64)
        assert acts["conv5_1"].shape == (1, 2, 2, 512)
        # trace target activations == vgg.encode's
        for t in ("relu1_1", "relu3_1"):
            conv = f"conv{t[4]}_1"
            np.testing.assert_array_equal(
                np.asarray(acts[conv]),
                np.asarray(vgg.encode(enc_params, x, t)),
            )


class TestEndToEnd:
    def test_solved_relu1_decoder_beats_random_init(self, enc_params):
        """Tiny pool, but the relu1_1 regression is massively
        overdetermined even at 32px — the ridge solve must land far
        above an untrained decoder (~8 dB) on held-out data."""
        from wct_tpu.train.data import synthetic_image

        rng = np.random.default_rng(1)
        specs = layerwise.regression_specs()
        stats = layerwise.init_stats(specs)
        for _ in range(4):
            batch = jnp.asarray(
                np.stack([synthetic_image(rng, 32) for _ in range(4)])
            )
            stats = layerwise.accumulate_stats(stats, enc_params, batch)
        decoders = layerwise.solved_decoder_params(
            jax.device_get(stats), verbose=False
        )
        # structure matches the trainer's init exactly
        want_tree = jax.tree.structure(
            dec_lib.init_decoder_params(jax.random.PRNGKey(0), "relu2_1")
        )
        assert jax.tree.structure(decoders["relu2_1"]) == want_tree

        held = np.stack(
            [synthetic_image(np.random.default_rng(99), 32) for _ in range(2)]
        )
        code = vgg.encode(enc_params, jnp.asarray(held), "relu1_1")
        dec = np.clip(
            np.asarray(dec_lib.decode(decoders["relu1_1"], code, "relu1_1")),
            0, 1,
        )
        psnr = 10 * np.log10(1.0 / np.mean((dec - held) ** 2))
        assert psnr > 20.0, f"ridge relu1_1 decoder only reached {psnr:.1f} dB"

    def test_refit_only_matches_full_pass_entry(self, enc_params):
        """Gauss–Seidel's per-conv pass (only=...) accumulates exactly
        the same (G, b) as that conv's entry in the full Jacobi pass."""
        rng = np.random.default_rng(7)
        batch = jnp.asarray(
            rng.random((2, 16, 16, 3)).astype(np.float32)
        )
        dec = dec_lib.init_decoder_params(jax.random.PRNGKey(1), "relu2_1")
        full = layerwise.accumulate_refit_stats(
            layerwise.init_refit_stats("relu2_1"), enc_params, dec, batch,
            target="relu2_1",
        )
        for name in full:
            solo = layerwise.accumulate_refit_stats(
                layerwise.init_refit_stats("relu2_1", only=name),
                enc_params, dec, batch, target="relu2_1", only=name,
            )
            assert set(solo) == {name}
            # Tight allclose, NOT bitwise: the two accumulations are
            # differently-shaped jitted programs (full Jacobi walk vs
            # only= early-return walk) and XLA may fuse/reassociate
            # them differently on other backends/jaxlib versions.
            # atol scaled to each array's magnitude: near-cancelling
            # cross-terms have unbounded RELATIVE error (see the uint8
            # equivalence test below for the same phenomenon).
            for key in ("G", "b"):
                a = np.asarray(solo[name][key])
                b = np.asarray(full[name][key])
                np.testing.assert_allclose(
                    a, b, rtol=1e-6, atol=1e-6 * np.abs(b).max()
                )

    def test_uint8_and_float_batches_accumulate_equivalently(self, enc_params):
        """uint8 pools feed the same statistics as f32 batches.

        NOT bitwise: XLA rewrites the device-side ``x / 255.0`` to a
        reciprocal multiply (≤1 ulp per pixel vs host true division),
        and this raw He-init encoder amplifies that into the deep
        Grams. Individual near-zero G entries (cross-terms that nearly
        cancel) have unbounded RELATIVE error, so the bound is scaled
        to each regression's own magnitude (measured max ~1e-7 of
        max|G|) — the quantity the λ·tr(G)/d ridge floor is also
        relative to, and orders below it at the default λ=1e-4.
        """
        specs = layerwise.regression_specs()
        img = (np.random.default_rng(3).random((2, 16, 16, 3)) * 255).astype(
            np.uint8
        )
        s_u8 = layerwise.accumulate_stats(
            layerwise.init_stats(specs), enc_params, jnp.asarray(img)
        )
        s_f32 = layerwise.accumulate_stats(
            layerwise.init_stats(specs),
            enc_params,
            jnp.asarray(img.astype(np.float32) / 255.0),
        )
        for k in s_u8:
            g_u8 = np.asarray(s_u8[k]["G"], np.float64)
            g_f32 = np.asarray(s_f32[k]["G"], np.float64)
            scale = np.abs(g_f32).max()
            dev = np.abs(g_u8 - g_f32).max()
            assert dev <= 1e-4 * scale, (k, dev, scale)
