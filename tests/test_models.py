"""Model-layer tests: encoder/decoder shapes, cascade plumbing (SURVEY.md §4.2).

Uses a tiny deterministic random "VGG" (fixed seed) — no real weights
needed to validate the plumbing: shapes per relu target, decoder
round-trip shapes, full cascade execution, modes, style caching,
interpolation, multi-pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wct_tpu.models import cascade, decoder, vgg

KEY = jax.random.PRNGKey(42)
SIZE = 32  # divisible by 16 → all 5 levels work


@pytest.fixture(scope="module")
def params():
    return cascade.init_params(KEY)


@pytest.fixture(scope="module")
def imgs(params):
    rng = np.random.default_rng(7)
    content = rng.random((1, SIZE, SIZE, 3), np.float32)
    style = rng.random((SIZE, SIZE, 3), np.float32)
    return content, style


class TestEncoder:
    @pytest.mark.parametrize(
        "target,ch,scale",
        [
            ("relu1_1", 64, 1),
            ("relu2_1", 128, 2),
            ("relu3_1", 256, 4),
            ("relu4_1", 512, 8),
            ("relu5_1", 512, 16),
        ],
    )
    def test_shapes(self, params, imgs, target, ch, scale):
        content, _ = imgs
        f = vgg.encode(params["encoder"], jnp.asarray(content), target)
        assert f.shape == (1, SIZE // scale, SIZE // scale, ch)
        assert np.all(np.asarray(f) >= 0)  # post-ReLU

    def test_encode_multi_matches_single(self, params, imgs):
        content, _ = imgs
        multi = vgg.encode_multi(
            params["encoder"], jnp.asarray(content), ("relu1_1", "relu3_1", "relu5_1")
        )
        for t in ("relu1_1", "relu3_1", "relu5_1"):
            single = vgg.encode(params["encoder"], jnp.asarray(content), t)
            np.testing.assert_array_equal(np.asarray(multi[t]), np.asarray(single))

    def test_metadata_tables(self):
        assert vgg.TARGET_CHANNELS["relu5_1"] == 512
        assert vgg.TARGET_SCALE["relu4_1"] == 8


class TestDecoder:
    @pytest.mark.parametrize("target", vgg.RELU_TARGETS)
    def test_roundtrip_shapes(self, params, imgs, target):
        content, _ = imgs
        f = vgg.encode(params["encoder"], jnp.asarray(content), target)
        out = decoder.decode(params["decoders"][target], f, target)
        assert out.shape == (1, SIZE, SIZE, 3)

    def test_mirror_structure_relu5(self):
        layers = decoder.decoder_layers("relu5_1")
        kinds = [l[0] for l in layers]
        assert kinds.count("upsample") == 4
        assert kinds.count("conv") == 13  # 1+4+4+2+2 mirrored convs
        # Final conv emits 3 channels.
        assert layers[-1][3] == 3

    def test_mirror_structure_relu1(self):
        layers = decoder.decoder_layers("relu1_1")
        assert [l[0] for l in layers] == ["conv"]
        assert layers[0][2:] == (64, 3, 3)


class TestCascade:
    def test_full_cascade_shape_and_range(self, params, imgs):
        content, style = imgs
        out = cascade.stylize_pair(
            params, jnp.asarray(content[0]), jnp.asarray(style), alpha=0.6
        )
        assert out.shape == (SIZE, SIZE, 3)
        o = np.asarray(out)
        assert np.all(o >= 0) and np.all(o <= 1) and np.all(np.isfinite(o))

    def test_single_level_config(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu3_1",))
        out = cascade.stylize_pair(
            params, jnp.asarray(content[0]), jnp.asarray(style), 1.0, cfg
        )
        assert out.shape == (SIZE, SIZE, 3)

    def test_adain_mode(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1"), transform="adain"
        )
        out = cascade.stylize_pair(
            params, jnp.asarray(content[0]), jnp.asarray(style), 0.8, cfg
        )
        assert out.shape == (SIZE, SIZE, 3)

    @pytest.mark.parametrize("soft", [False, True])
    def test_swap5_mode(self, params, soft):
        # relu5_1 features are H/16 — need ≥48px for 3×3 patches.
        # soft=True also exercises the cfg.soft_trunc plumbing into the
        # swap level's fused whiten+color decomposition.
        rng = np.random.default_rng(5)
        content = rng.random((64, 64, 3), np.float32)
        style = rng.random((64, 64, 3), np.float32)
        cfg = cascade.CascadeConfig(
            relu_targets=("relu5_1",), swap5=True, soft_trunc=soft
        )
        out = cascade.stylize_pair(
            params, jnp.asarray(content), jnp.asarray(style), 1.0, cfg
        )
        assert out.shape == (64, 64, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_multi_pass(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1",), passes=2)
        out = cascade.stylize_pair(
            params, jnp.asarray(content[0]), jnp.asarray(style), 1.0, cfg
        )
        assert out.shape == (SIZE, SIZE, 3)

    def test_style_cache_reuse_bitwise(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu3_1", "relu1_1"))
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        a = cascade.stylize(params, jnp.asarray(content), cache, 0.5, cfg)
        b = cascade.stylize(params, jnp.asarray(content), cache, 0.5, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_batch_stability(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        batch = jnp.concatenate([jnp.asarray(content)] * 3)
        full = cascade.stylize(params, batch, cache, 1.0, cfg)
        one = cascade.stylize(params, jnp.asarray(content), cache, 1.0, cfg)
        np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(one[0]))

    def test_microbatched_matches_per_image(self, params, imgs):
        # The fixed-microbatch serving path: DISTINCT images, batch of
        # 5 through microbatch=2 (pad + 3 chunks) must reproduce each
        # image's solo-submission output bitwise, in order.
        content, style = imgs
        rng = np.random.default_rng(9)
        batch = np.concatenate(
            [content] + [rng.random(content.shape, np.float32) for _ in range(4)]
        )
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        out = cascade.stylize_microbatched(
            params, jnp.asarray(batch), cache, 0.8, cfg, microbatch=2
        )
        assert out.shape == batch.shape
        for i in range(5):
            solo = cascade.stylize_microbatched(
                params, jnp.asarray(batch[i : i + 1]), cache, 0.8, cfg,
                microbatch=2,
            )
            np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(solo[0]))

    def test_microbatched_empty_batch(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu1_1",))
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        out = cascade.stylize_microbatched(
            params, jnp.asarray(content[:0]), cache, 1.0, cfg, microbatch=2
        )
        assert out.shape[0] == 0

    def test_microbatched_rejects_bad_size(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu1_1",))
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        with pytest.raises(ValueError, match="microbatch"):
            cascade.stylize_microbatched(
                params, jnp.asarray(content), cache, 1.0, cfg, microbatch=0
            )

    def test_interpolation(self, params, imgs):
        content, style = imgs
        rng = np.random.default_rng(3)
        style2 = rng.random((SIZE, SIZE, 3), np.float32)
        cfg = cascade.CascadeConfig(relu_targets=("relu3_1",))
        c1 = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        c2 = cascade.precompute_style(params["encoder"], jnp.asarray(style2), cfg)
        blended = cascade.interpolate_style_caches([c1, c2], jnp.asarray([0.5, 0.5]), cfg)
        out = cascade.stylize(params, jnp.asarray(content), blended, 1.0, cfg)
        assert np.all(np.isfinite(np.asarray(out)))
        # weights (1,0) == style 1 alone
        w10 = cascade.interpolate_style_caches([c1, c2], jnp.asarray([1.0, 0.0]), cfg)
        out10 = cascade.stylize(params, jnp.asarray(content), w10, 1.0, cfg)
        out1 = cascade.stylize(params, jnp.asarray(content), c1, 1.0, cfg)
        np.testing.assert_allclose(np.asarray(out10), np.asarray(out1), atol=1e-5)

    def test_bfloat16_mode_tracks_float32(self, params, imgs):
        content, style = imgs
        cfg32 = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        cfg16 = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), compute_dtype="bfloat16"
        )
        o32 = np.asarray(
            cascade.stylize_pair(params, jnp.asarray(content[0]), jnp.asarray(style), 0.7, cfg32)
        )
        o16 = np.asarray(
            cascade.stylize_pair(params, jnp.asarray(content[0]), jnp.asarray(style), 0.7, cfg16)
        ).astype(np.float32)
        # bf16 convs track f32 within a coarse tolerance on the body of
        # the distribution (clip saturation + chaos move the tail).
        assert np.median(np.abs(o32 - o16)) < 0.05

    def test_stylize_interp_matches_manual_blend(self, params, imgs):
        content, style = imgs
        rng = np.random.default_rng(21)
        style2 = rng.random((SIZE, SIZE, 3), np.float32)
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1",))
        c1 = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        c2 = cascade.precompute_style(params["encoder"], jnp.asarray(style2), cfg)
        w = jnp.asarray([0.4, 0.6], jnp.float32)
        fused = cascade.stylize_interp(
            params, jnp.asarray(content), [c1, c2], w, 0.8, cfg
        )
        manual = cascade.stylize(
            params,
            jnp.asarray(content),
            cascade.interpolate_style_caches([c1, c2], w, cfg),
            0.8,
            cfg,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(manual), atol=1e-5
        )

    def test_adain_with_swap5(self, params):
        # swap at relu5_1, AdaIN below — a reference-legal combination.
        rng = np.random.default_rng(5)
        content = rng.random((64, 64, 3), np.float32)
        style = rng.random((64, 64, 3), np.float32)
        cfg = cascade.CascadeConfig(
            relu_targets=("relu5_1", "relu2_1"), transform="adain", swap5=True
        )
        out = cascade.stylize_pair(
            params, jnp.asarray(content), jnp.asarray(style), 0.9, cfg
        )
        assert out.shape == (64, 64, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_non_multiple_sizes_preserved(self, params):
        # 50x45 is not a multiple of 16: VALID pooling floor-halves, so
        # without input padding the output would come back 48x32.
        rng = np.random.default_rng(13)
        content = rng.random((50, 45, 3)).astype(np.float32)
        style = rng.random((40, 40, 3)).astype(np.float32)
        out = cascade.stylize_pair(
            params, jnp.asarray(content), jnp.asarray(style), 0.7
        )
        assert out.shape == (50, 45, 3)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="relu_targets"):
            cascade.CascadeConfig(relu_targets=("relu9_9",))
        with pytest.raises(ValueError, match="swap5"):
            cascade.CascadeConfig(relu_targets=("relu3_1",), swap5=True)
        with pytest.raises(ValueError, match="transform"):
            cascade.CascadeConfig(transform="wavelet")
        with pytest.raises(ValueError, match="duplicate"):
            cascade.CascadeConfig(relu_targets=("relu1_1", "relu1_1"))
        with pytest.raises(ValueError, match="passes"):
            cascade.CascadeConfig(passes=0)
        # rel_trunc (VERDICT r3 item 5): exclusive with soft_trunc,
        # range-checked, eigh-only (spectrum mask — NS paths have none).
        with pytest.raises(ValueError, match="mutually exclusive"):
            cascade.CascadeConfig(rel_trunc=1e-3, soft_trunc=True)
        with pytest.raises(ValueError, match="rel_trunc must be"):
            cascade.CascadeConfig(rel_trunc=1.5)
        with pytest.raises(ValueError, match="rel_trunc"):
            cascade.CascadeConfig(rel_trunc=1e-3, method="newton_schulz")

    def test_rel_trunc_cascade_runs(self, params):
        """End-to-end cascade with the relative threshold, including
        the swap5 path (whiten_color_kernels plumbing)."""
        rng = np.random.default_rng(21)
        content = rng.random((48, 48, 3)).astype(np.float32)
        style = rng.random((48, 48, 3)).astype(np.float32)
        for extra in ({}, {"swap5": True}):
            cfg = cascade.CascadeConfig(
                relu_targets=("relu5_1", "relu1_1"), rel_trunc=1e-3, **extra
            )
            out = cascade.stylize_pair(
                params, jnp.asarray(content), jnp.asarray(style), 0.8, cfg
            )
            assert out.shape == (48, 48, 3)
            assert np.all(np.isfinite(np.asarray(out)))

    def test_alpha_is_traced_no_recompile(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu1_1",))
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        with jax.checking_leaks():
            n0 = cascade.stylize._cache_size()
            cascade.stylize(params, jnp.asarray(content), cache, 0.3, cfg)
            cascade.stylize(params, jnp.asarray(content), cache, 0.9, cfg)
            # Only float→array promotion differs; both hit one trace.
            assert cascade.stylize._cache_size() - n0 <= 1


class TestTransformFolding:
    """decode_folded ≡ transform-then-decode (both paths linear)."""

    def test_decode_folded_matches_unfolded(self, params, rng):
        import jax
        import jax.numpy as jnp

        from wct_tpu.models import decoder as dec_lib

        B, h, w, C = 2, 8, 8, 64
        f = jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((B, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
        transformed = jnp.einsum("bhwc,bcd->bhwd", f, m) + bias[:, None, None]
        for target in ("relu1_1", "relu2_1"):
            dp = params["decoders"][target]
            if target == "relu2_1":
                # relu2_1 decoder's first conv takes 128 channels
                C2 = 128
                f2 = jnp.asarray(
                    rng.standard_normal((B, h, w, C2)), jnp.float32
                )
                m2 = jnp.asarray(
                    rng.standard_normal((B, C2, C2)) * 0.1, jnp.float32
                )
                b2 = jnp.asarray(rng.standard_normal((B, C2)) * 0.1, jnp.float32)
                t2 = jnp.einsum("bhwc,bcd->bhwd", f2, m2) + b2[:, None, None]
                ref = dec_lib.decode(dp, t2, target)
                got = dec_lib.decode_folded(dp, f2, target, m2, b2)
            else:
                ref = dec_lib.decode(dp, transformed, target)
                got = dec_lib.decode_folded(dp, f, target, m, bias)
            assert jnp.max(jnp.abs(got - ref)) < 1e-3, target

    def test_decode_folded_diagonal(self, params, rng):
        import jax.numpy as jnp

        from wct_tpu.models import decoder as dec_lib

        B, h, w, C = 2, 8, 8, 64
        f = jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((B, C)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
        transformed = f * scale[:, None, None] + bias[:, None, None]
        ref = dec_lib.decode(params["decoders"]["relu1_1"], transformed, "relu1_1")
        got = dec_lib.decode_folded(
            params["decoders"]["relu1_1"], f, "relu1_1", scale, bias
        )
        assert jnp.max(jnp.abs(got - ref)) < 1e-4

    def test_cascade_fold_on_off_agree(self, params, imgs):
        import dataclasses

        import jax.numpy as jnp

        from wct_tpu.models import cascade

        content, style = imgs
        for transform in ("wct", "adain"):
            cfg_on = cascade.CascadeConfig(
                relu_targets=("relu2_1", "relu1_1"),
                transform=transform,
                fold_transform=True,
            )
            cfg_off = dataclasses.replace(cfg_on, fold_transform=False)
            cache = cascade.precompute_style(
                params["encoder"], jnp.asarray(style), cfg_on
            )
            content_b = jnp.asarray(content)
            out_on = cascade.stylize(params, content_b, cache, 0.7, cfg_on)
            out_off = cascade.stylize(params, content_b, cache, 0.7, cfg_off)
            # identical math, different matmul association; untrained
            # decoders amplify ULPs, so compare loosely
            assert (
                jnp.max(jnp.abs(out_on - out_off)) < 5e-2
            ), transform


class TestFusedJunction:
    """fuse_junction=True ≡ the unfused cascade (same math)."""

    def test_fused_matches_unfused_f32(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1", "relu1_1"),
            fuse_junction=True,
        )
        # the fixture images must satisfy the shape gate
        assert content.shape[1] % 16 == 0 and content.shape[2] % 16 == 0
        cfg_off = dataclasses.replace(cfg, fuse_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.asarray(content)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        # f32 path: matmul-association-level agreement only (untrained
        # decoders amplify ULPs through 3 levels)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2

    def test_fused_clip_between_levels(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"),
            fuse_junction=True,
            clip_between_levels=True,
        )
        cfg_off = dataclasses.replace(cfg, fuse_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.asarray(content)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2

    def test_fused_multi_pass_and_bf16(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"),
            fuse_junction=True,
            passes=2,
            compute_dtype="bfloat16",
            method="auto",
        )
        cfg_off = dataclasses.replace(cfg, fuse_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.asarray(content)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert on.shape == off.shape
        assert bool(jnp.all(jnp.isfinite(on)))
        # bf16 + 2 passes through UNTRAINED decoders amplifies fp noise
        # to full scale (0/1 clip flips), so only a structural check is
        # meaningful here; exact agreement is pinned by the f32 tests.
        assert float(jnp.min(on)) >= 0.0 and float(jnp.max(on)) <= 1.0

    def test_fuse_rejects_fold_combo(self):
        import pytest

        with pytest.raises(ValueError, match="mutually exclusive"):
            cascade.CascadeConfig(fuse_junction=True, fold_transform=True)

    def test_unfusable_shape_falls_back(self, params, imgs):
        """Shapes failing the H/W % 16 eligibility gate silently run unfused."""
        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), fuse_junction=True
        )
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.asarray(content)[:, :24, :, :]  # H=24 not mult of 16
        out = cascade.stylize(params, c, cache, 0.7, cfg)
        assert out.shape == c.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_encoder_head_matches_xla(self, params, rng):
        """encoder_head kernel == conv0→conv1_1→relu→conv1_2→relu→pool."""
        from wct_tpu.models import vgg
        from wct_tpu.ops import junction_pallas
        from wct_tpu.ops.convs import conv2d_reflect, maxpool2

        enc = params["encoder"]
        img = jnp.asarray(rng.random((2, 48, 32, 3)), jnp.float32)
        got = junction_pallas.encoder_head(
            img,
            enc["conv0"]["w"], enc["conv0"]["b"],
            enc["conv1_1"]["w"], enc["conv1_1"]["b"],
            enc["conv1_2"]["w"], enc["conv1_2"]["b"],
        )
        x = conv2d_reflect(img, enc["conv0"]["w"], enc["conv0"]["b"])
        x = jax.nn.relu(conv2d_reflect(x, enc["conv1_1"]["w"], enc["conv1_1"]["b"]))
        x = jax.nn.relu(conv2d_reflect(x, enc["conv1_2"]["w"], enc["conv1_2"]["b"]))
        ref = maxpool2(x)
        # conv0 is folded into conv1_1 in the kernel → association noise
        # only; conv0's weights are O(255) so scale the tolerance
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err / scale < 1e-5, (err, scale)

    def test_decoder_tail_perimage_matches_fold(self, params, rng):
        """decoder_tail kernel == transform-then-decode at relu1_1."""
        from wct_tpu.models import decoder as dec_lib
        from wct_tpu.ops import junction_pallas

        B, H, W, C = 2, 32, 32, 64
        f = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((B, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
        dp = params["decoders"]["relu1_1"]
        transformed = jnp.einsum("bhwc,bcd->bhwd", f, m) + bias[:, None, None]
        ref = dec_lib.decode(dp, transformed, "relu1_1")
        wf, bf = dec_lib.fold_affine_into_conv(
            m, bias, dp["dec_conv1_1"]["w"], dp["dec_conv1_1"]["b"]
        )
        got = junction_pallas.decoder_tail(f, wf, bf, clip=False)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-3, err


class TestPack2Junction:
    """pack2_junction ≡ the unpacked cascade (identical math)."""

    def test_pack2_matches_unpacked_f32(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1", "relu1_1"),
            pack2_junction=True,
        )
        cfg_off = dataclasses.replace(cfg, pack2_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.concatenate([jnp.asarray(content)] * 2)  # even batch
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2
        # the two batch entries are the same image — packed pairing
        # must not mix them
        assert float(jnp.max(jnp.abs(on[0] - on[1]))) < 1e-5

    def test_pack2_odd_batch_falls_back(self, params, imgs):
        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), pack2_junction=True
        )
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        out = cascade.stylize(params, jnp.asarray(content), cache, 0.7, cfg)
        assert out.shape == content.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_pack2_rejects_combos(self):
        import pytest

        with pytest.raises(ValueError, match="mutually exclusive"):
            cascade.CascadeConfig(pack2_junction=True, fuse_junction=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            cascade.CascadeConfig(pack2_junction=True, fold_transform=True)

    def test_packed_tail_single_level_relu1_1(self, params, imgs):
        """head_pack2_shallow + tail_pack2 on a relu1_1-only cascade ≡
        the unpacked path (per-image stats from the packed Gram's
        diagonal blocks; α-blended transform as a block-diag matmul)."""
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu1_1",), pack2_junction=True
        )
        cfg_off = dataclasses.replace(cfg, pack2_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        rng = np.random.default_rng(5)
        c = jnp.asarray(
            rng.random((2,) + content.shape[1:]), jnp.float32
        )  # two DISTINCT images — packing must not mix the pair
        on = cascade.stylize(params, c, cache, 0.6, cfg)
        off = cascade.stylize(params, c, cache, 0.6, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2

    def test_pack2_tail_only_matches_unpacked(self, params, imgs):
        """pack2_tail_only (round-4 resolution-scoped packing): the
        junctions run unpacked, only the relu1_1 tail packs — output
        must still match the plain cascade, and the config must refuse
        tail_only without pack2."""
        import dataclasses

        import pytest

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1", "relu1_1"),
            pack2_junction=True, pack2_tail_only=True,
        )
        cfg_off = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1", "relu1_1"),
        )
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        rng = np.random.default_rng(6)
        c = jnp.asarray(rng.random((2,) + content.shape[1:]), jnp.float32)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2
        with pytest.raises(ValueError, match="pack2_tail_only"):
            cascade.CascadeConfig(pack2_tail_only=True)

    def test_pack2_junction_only_matches_unpacked(self, params, imgs):
        """pack2_junction_only (round-4, the INVERSE scope measured to
        be the right split at 1024px): junctions pack, the relu1_1
        tail runs unpacked — output must match the plain cascade, and
        the config must refuse the scope without pack2 or combined
        with tail_only."""
        import pytest

        content, style = imgs
        # rel_trunc: the flip-free spectrum mask (keep s > R*s_max,
        # measured bit-identical across solvers/retilings) — without
        # it this cross-tiling comparison sits on the 1e-5 value-mask
        # knife edge and flips on a handful of pixels for SOME seeds
        # (DESIGN 2b; observed: this very test at seed 16).
        cfg = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1", "relu1_1"),
            pack2_junction=True, pack2_junction_only=True, rel_trunc=1e-3,
        )
        cfg_off = cascade.CascadeConfig(
            relu_targets=("relu3_1", "relu2_1", "relu1_1"), rel_trunc=1e-3,
        )
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        rng = np.random.default_rng(16)
        c = jnp.asarray(rng.random((2,) + content.shape[1:]), jnp.float32)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2
        with pytest.raises(ValueError, match="pack2_junction_only"):
            cascade.CascadeConfig(pack2_junction_only=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            cascade.CascadeConfig(
                pack2_junction=True, pack2_junction_only=True,
                pack2_tail_only=True,
            )

    def test_packed_tail_adain_mode(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), pack2_junction=True,
            transform="adain",
        )
        cfg_off = dataclasses.replace(cfg, pack2_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.concatenate([jnp.asarray(content)] * 2)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2

    def test_packed_tail_grouped_falls_back(self, params, imgs):
        """wct_groups > 1 keeps the unpacked relu1_1 path (and still
        matches the no-pack2 config)."""
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), pack2_junction=True,
            wct_groups=2,
        )
        cfg_off = dataclasses.replace(cfg, pack2_junction=False)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.concatenate([jnp.asarray(content)] * 2)
        on = cascade.stylize(params, c, cache, 0.7, cfg)
        off = cascade.stylize(params, c, cache, 0.7, cfg_off)
        assert float(jnp.max(jnp.abs(on - off))) < 2e-2


class TestNsIters:
    """Per-level Newton-Schulz iteration override (CascadeConfig.ns_iters)."""

    def test_validation(self):
        with pytest.raises(ValueError, match="ns_iters"):
            cascade.CascadeConfig(ns_iters=0)
        with pytest.raises(ValueError, match="ns_iters"):
            cascade.CascadeConfig(ns_iters=(("relu9_9", 8),))
        cascade.CascadeConfig(ns_iters=10)
        cfg = cascade.CascadeConfig(ns_iters=(("relu5_1", 12), ("relu1_1", 8)))
        assert cfg.ns_iters_for("relu5_1") == 12
        assert cfg.ns_iters_for("relu1_1") == 8
        assert cfg.ns_iters_for("relu3_1") is None

    def test_high_iters_matches_default(self, params, imgs):
        """ns_iters≥default converges to the same fixed point: outputs of
        the 14-iter default and an 18-iter override agree closely."""
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), method="newton_schulz"
        )
        cfg18 = dataclasses.replace(cfg, ns_iters=18)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        c = jnp.asarray(content)
        base = cascade.stylize(params, c, cache, 0.7, cfg)
        more = cascade.stylize(params, c, cache, 0.7, cfg18)
        assert float(jnp.max(jnp.abs(base - more))) < 5e-2

    def test_cli_parse(self):
        from wct_tpu.cli.common import _parse_ns_iters

        assert _parse_ns_iters(None) is None
        assert _parse_ns_iters("10") == 10
        assert _parse_ns_iters("relu5_1=12,relu1_1=8") == (
            ("relu5_1", 12), ("relu1_1", 8)
        )
        with pytest.raises(SystemExit):
            _parse_ns_iters("abc")


class TestRingConv:
    """ring_conv=True ≡ the default padded-reflect cascade (same math)."""

    def test_ring_matches_padded_full_cascade(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig()  # full 5-level
        cfg_ring = dataclasses.replace(cfg, ring_conv=True)
        cache = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg
        )
        cache_ring = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg_ring
        )
        c = jnp.asarray(content)
        base = cascade.stylize(params, c, cache, 0.7, cfg)
        ring = cascade.stylize(params, c, cache_ring, 0.7, cfg_ring)
        # Same taps, same reflect values; tolerance only for XLA
        # fusion-order fp differences amplified by the random decoders.
        assert float(jnp.max(jnp.abs(base - ring))) < 2e-2

    def test_ring_non_multiple_size(self, params):
        """Ring path handles the pre-pad to the pool multiple (odd
        sizes exercise the strip splicing at non-16-multiple shapes)."""
        rng = np.random.default_rng(3)
        c = jnp.asarray(rng.random((1, 37, 45, 3), np.float32))
        s = jnp.asarray(rng.random((32, 32, 3), np.float32))
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), ring_conv=True
        )
        cache = cascade.precompute_style(params["encoder"], s, cfg)
        out = cascade.stylize(params, c, cache, 0.7, cfg)
        assert out.shape == c.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_ring_cli_flag(self):
        import argparse

        from wct_tpu.cli import common

        p = argparse.ArgumentParser()
        common.add_model_flags(p)
        args = p.parse_args(["--ring-conv"])
        assert common.config_from_args(args).ring_conv is True
        args = p.parse_args([])
        assert common.config_from_args(args).ring_conv is False


class TestComposeConv0:
    """compose_conv0 folds the 1×1 preprocessing conv into conv1_1 —
    identical math, conv0's HLO gone."""

    def test_encode_multi_composed_matches(self, params, imgs):
        content, _ = imgs
        x = jnp.asarray(content)
        base = vgg.encode_multi(params["encoder"], x, ("relu1_1", "relu3_1"))
        comp = vgg.encode_multi(
            params["encoder"], x, ("relu1_1", "relu3_1"), compose_pre=True
        )
        for t in ("relu1_1", "relu3_1"):
            np.testing.assert_allclose(
                np.asarray(comp[t]), np.asarray(base[t]), atol=2e-4, rtol=1e-4
            )

    def test_cascade_composed_matches(self, params, imgs):
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(relu_targets=("relu3_1", "relu2_1", "relu1_1"))
        cfg_c = dataclasses.replace(cfg, compose_conv0=True)
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        cache_c = cascade.precompute_style(
            params["encoder"], jnp.asarray(style), cfg_c
        )
        c = jnp.asarray(content)
        base = cascade.stylize(params, c, cache, 0.7, cfg)
        comp = cascade.stylize(params, c, cache_c, 0.7, cfg_c)
        assert float(jnp.max(jnp.abs(base - comp))) < 2e-2

    def test_cascade_composed_pack2_matches(self, params, imgs):
        """compose through head_pack2/head_pack2_shallow/junction_pack2."""
        import dataclasses

        content, style = imgs
        cfg = cascade.CascadeConfig(
            relu_targets=("relu2_1", "relu1_1"), pack2_junction=True
        )
        cfg_c = dataclasses.replace(cfg, compose_conv0=True)
        cache = cascade.precompute_style(params["encoder"], jnp.asarray(style), cfg)
        c = jnp.concatenate([jnp.asarray(content)] * 2)  # even batch
        base = cascade.stylize(params, c, cache, 0.7, cfg)
        comp = cascade.stylize(params, c, cache, 0.7, cfg_c)
        assert float(jnp.max(jnp.abs(base - comp))) < 2e-2

    def test_compose_helper_exact(self, rng=None):
        from wct_tpu.ops.convs import compose_1x1_into_conv, conv2d_reflect

        r = np.random.default_rng(5)
        x = jnp.asarray(r.standard_normal((2, 9, 9, 3)), jnp.float32)
        w0 = jnp.asarray(r.standard_normal((1, 1, 3, 3)), jnp.float32)
        b0 = jnp.asarray(r.standard_normal((3,)), jnp.float32)
        w1 = jnp.asarray(r.standard_normal((3, 3, 3, 8)), jnp.float32)
        b1 = jnp.asarray(r.standard_normal((8,)), jnp.float32)
        ref = conv2d_reflect(conv2d_reflect(x, w0, b0), w1, b1)
        wc, bc = compose_1x1_into_conv(w0, b0, w1, b1)
        got = conv2d_reflect(x, wc, bc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_rejects_fuse_junction(self):
        with pytest.raises(ValueError, match="compose_conv0"):
            cascade.CascadeConfig(compose_conv0=True, fuse_junction=True)

    def test_cli_preset_and_override(self):
        import argparse

        from wct_tpu.cli import common

        p = argparse.ArgumentParser()
        common.add_model_flags(p)
        a = p.parse_args(["--preset", "throughput"])
        assert common.config_from_args(a).compose_conv0 is True
        a = p.parse_args(["--preset", "throughput", "--no-compose-conv0"])
        assert common.config_from_args(a).compose_conv0 is False
        a = p.parse_args(["--compose-conv0"])
        assert common.config_from_args(a).compose_conv0 is True
        a = p.parse_args([])
        assert common.config_from_args(a).compose_conv0 is False
