"""Converter tests: t7 round-trip, t7→encoder mapping, TF-var mapping."""

import numpy as np
import pytest

from wct_tpu.models import decoder as dec_lib
from wct_tpu.models import vgg
from wct_tpu.tools import convert_t7, convert_tf_ckpt, t7_reader


class TestT7Reader:
    def test_roundtrip_primitives(self, tmp_path):
        obj = {
            "num": 3.5,
            "flag": True,
            "name": "hello",
            "list": [1.0, 2.0, "x"],
            "none": None,
        }
        path = tmp_path / "prim.t7"
        t7_reader.write_t7(str(path), obj)
        back = t7_reader.load_t7(str(path))
        assert back["num"] == 3.5
        assert back["flag"] is True
        assert back["name"] == "hello"
        assert back["list"] == [1.0, 2.0, "x"]
        assert back["none"] is None

    def test_roundtrip_tensors(self, tmp_path, rng):
        w32 = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
        w64 = rng.standard_normal((5,)).astype(np.float64)
        path = tmp_path / "tensors.t7"
        t7_reader.write_t7(str(path), {"w": w32, "b": w64})
        back = t7_reader.load_t7(str(path))
        np.testing.assert_array_equal(back["w"], w32)
        np.testing.assert_array_equal(back["b"], w64)

    def test_roundtrip_torch_object(self, tmp_path, rng):
        mod = t7_reader.TorchObject(
            "nn.SpatialConvolution",
            {"weight": rng.standard_normal((2, 3, 1, 1)).astype(np.float32),
             "bias": np.zeros(2, np.float32)},
        )
        seq = t7_reader.TorchObject("nn.Sequential", {"modules": [mod]})
        path = tmp_path / "seq.t7"
        t7_reader.write_t7(str(path), seq)
        back = t7_reader.load_t7(str(path))
        assert back.torch_typename == "nn.Sequential"
        assert back["modules"][0].torch_typename == "nn.SpatialConvolution"
        np.testing.assert_array_equal(
            back["modules"][0]["weight"], mod.attrs["weight"]
        )


def _fake_vgg_t7(rng) -> t7_reader.TorchObject:
    """Synthetic nn.Sequential matching the normalised-VGG layout."""
    modules = []
    for spec in vgg.ENCODER_LAYERS:
        if spec[0] == "pool":
            modules.append(t7_reader.TorchObject("nn.SpatialMaxPooling", {}))
            continue
        _, name, in_c, out_c, k = spec
        if k > 1:
            modules.append(
                t7_reader.TorchObject("nn.SpatialReflectionPadding", {})
            )
        modules.append(
            t7_reader.TorchObject(
                "nn.SpatialConvolution",
                {
                    "weight": rng.standard_normal((out_c, in_c, k, k)).astype(
                        np.float32
                    ),
                    "bias": rng.standard_normal((out_c,)).astype(np.float32),
                },
            )
        )
        modules.append(t7_reader.TorchObject("nn.ReLU", {}))
    return t7_reader.TorchObject("nn.Sequential", {"modules": modules})


class TestConvertT7:
    def test_maps_all_encoder_convs(self, tmp_path, rng):
        t7 = _fake_vgg_t7(rng)
        params = convert_t7.t7_to_encoder_params(t7)
        conv_names = [s[1] for s in vgg.ENCODER_LAYERS if s[0] != "pool"]
        assert set(params) == set(conv_names)
        # HWIO layout with correct channels.
        assert params["conv1_1"]["w"].shape == (3, 3, 3, 64)
        assert params["conv0"]["w"].shape == (1, 1, 3, 3)

    def test_weights_transposed_correctly(self, rng):
        t7 = _fake_vgg_t7(rng)
        convs = [
            m for m in convert_t7._iter_modules(t7)
            if m.torch_typename.endswith("SpatialConvolution")
        ]
        params = convert_t7.t7_to_encoder_params(t7)
        np.testing.assert_array_equal(
            params["conv1_1"]["w"],
            convs[1]["weight"].transpose(2, 3, 1, 0),
        )

    def test_cli_end_to_end(self, tmp_path, rng):
        from wct_tpu.train import checkpoint

        t7_path = tmp_path / "vgg.t7"
        t7_reader.write_t7(str(t7_path), _fake_vgg_t7(rng))
        out = tmp_path / "encoder.npz"
        convert_t7.main([str(t7_path), str(out)])
        tree = checkpoint.load_pytree(out)
        assert "conv5_1" in tree["encoder"]

        # And the converted encoder actually runs.
        import jax.numpy as jnp

        f = vgg.encode(
            tree["encoder"], jnp.asarray(rng.random((1, 32, 32, 3), np.float32)),
            "relu3_1",
        )
        assert f.shape == (1, 8, 8, 256)

    def test_truncated_t7_fails_loudly(self, rng):
        t7 = _fake_vgg_t7(rng)
        t7.attrs["modules"] = t7.attrs["modules"][:5]
        with pytest.raises(ValueError, match="convolutions"):
            convert_t7.t7_to_encoder_params(t7)


class TestMakeBundle:
    def test_end_to_end(self, tmp_path, rng):
        import jax

        from wct_tpu.tools import make_bundle
        from wct_tpu.train import checkpoint

        enc = vgg.init_encoder_params(jax.random.PRNGKey(0))
        checkpoint.save_pytree(tmp_path / "enc.npz", {"encoder": enc})
        d1 = dec_lib.init_decoder_params(jax.random.PRNGKey(1), "relu1_1")
        d2 = dec_lib.init_decoder_params(jax.random.PRNGKey(2), "relu2_1")
        checkpoint.save_pytree(tmp_path / "d1.npz", d1)
        checkpoint.save_pytree(tmp_path / "d2.npz", {"params": d2})  # train-state form
        out = tmp_path / "bundle.npz"
        make_bundle.main(
            [
                "--encoder", str(tmp_path / "enc.npz"),
                "--decoder", f"relu1_1={tmp_path / 'd1.npz'}",
                "--decoder", f"relu2_1={tmp_path / 'd2.npz'}",
                str(out),
            ]
        )
        bundle = checkpoint.load_pytree(out)
        assert set(bundle["decoders"]) == {"relu1_1", "relu2_1"}
        assert "conv1_1" in bundle["encoder"]

    def test_float16_storage_roundtrip(self, tmp_path, rng):
        """--store-dtype float16 halves the artifact; load upcasts to f32."""
        import jax
        import numpy as np

        from wct_tpu.tools import make_bundle
        from wct_tpu.train import checkpoint

        enc = vgg.init_encoder_params(jax.random.PRNGKey(0))
        checkpoint.save_pytree(tmp_path / "enc.npz", {"encoder": enc})
        d1 = dec_lib.init_decoder_params(jax.random.PRNGKey(1), "relu1_1")
        checkpoint.save_pytree(tmp_path / "d1.npz", d1)
        out32, out16 = tmp_path / "b32.npz", tmp_path / "b16.npz"
        base = [
            "--encoder", str(tmp_path / "enc.npz"),
            "--decoder", f"relu1_1={tmp_path / 'd1.npz'}",
        ]
        make_bundle.main(base + [str(out32)])
        make_bundle.main(base + ["--store-dtype", "float16", str(out16)])
        assert out16.stat().st_size < 0.6 * out32.stat().st_size
        b32 = checkpoint.load_pytree(out32)
        b16 = checkpoint.load_pytree(out16)
        w32 = np.asarray(b32["encoder"]["conv1_1"]["w"])
        w16 = np.asarray(b16["encoder"]["conv1_1"]["w"])
        assert w16.dtype == np.float32  # upcast on load
        # f16 rounding: ~2^-11 relative
        np.testing.assert_allclose(w16, w32, rtol=1e-3, atol=1e-4)

    def test_wrong_level_fails(self, tmp_path, rng):
        import jax

        from wct_tpu.tools import make_bundle
        from wct_tpu.train import checkpoint

        enc = vgg.init_encoder_params(jax.random.PRNGKey(0))
        checkpoint.save_pytree(tmp_path / "enc.npz", {"encoder": enc})
        d1 = dec_lib.init_decoder_params(jax.random.PRNGKey(1), "relu1_1")
        checkpoint.save_pytree(tmp_path / "d1.npz", d1)
        with pytest.raises(ValueError, match="missing conv"):
            make_bundle.main(
                [
                    "--encoder", str(tmp_path / "enc.npz"),
                    "--decoder", f"relu3_1={tmp_path / 'd1.npz'}",
                    str(tmp_path / "b.npz"),
                ]
            )


class TestCompareOutputs:
    def test_identical_dirs_pass(self, tmp_path, rng):
        from wct_tpu.tools import compare_outputs
        from wct_tpu.utils import images

        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(); b.mkdir()
        img = rng.random((16, 16, 3))
        images.save_img(a / "x.png", img)
        images.save_img(b / "x.png", img)
        assert compare_outputs.main([str(a), str(b)]) == 0

    def test_differing_dirs_fail(self, tmp_path, rng):
        from wct_tpu.tools import compare_outputs
        from wct_tpu.utils import images

        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(); b.mkdir()
        images.save_img(a / "x.png", rng.random((16, 16, 3)))
        images.save_img(b / "x.png", rng.random((16, 16, 3)))
        assert compare_outputs.main([str(a), str(b), "--tol", "0.01"]) == 1

    def test_no_common_files(self, tmp_path, rng):
        from wct_tpu.tools import compare_outputs
        from wct_tpu.utils import images

        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(); b.mkdir()
        images.save_img(a / "only_a.png", rng.random((8, 8, 3)))
        images.save_img(b / "only_b.png", rng.random((8, 8, 3)))
        assert compare_outputs.main([str(a), str(b)]) == 2


class TestConvertTFCkpt:
    def test_positional_mapping(self, rng):
        target = "relu2_1"
        specs = [s for s in dec_lib.decoder_layers(target) if s[0] == "conv"]
        variables = {}
        for i, (_, name, in_c, out_c, k) in enumerate(specs):
            variables[f"decoder_{target}/conv_{i}/kernel"] = rng.standard_normal(
                (k, k, in_c, out_c)
            ).astype(np.float32)
            variables[f"decoder_{target}/conv_{i}/bias"] = rng.standard_normal(
                (out_c,)
            ).astype(np.float32)
        params = convert_tf_ckpt.tf_vars_to_decoder_params(variables, target)
        assert set(params) == {s[1] for s in specs}
        np.testing.assert_array_equal(
            params[specs[0][1]]["w"],
            variables[f"decoder_{target}/conv_0/kernel"],
        )

    def test_wrong_shapes_fail(self, rng):
        variables = {
            "k0": rng.standard_normal((3, 3, 7, 7)).astype(np.float32),
            "b0": np.zeros(7, np.float32),
        }
        with pytest.raises(ValueError):
            convert_tf_ckpt.tf_vars_to_decoder_params(variables, "relu1_1")


class TestNormalizeEncoder:
    """Gatys activation normalisation of the encoder (SURVEY C5/§3.5:
    vgg_normalised.t7 has mean post-ReLU activation 1 per channel)."""

    def test_means_become_one_and_relu_commutes(self, rng):
        import jax

        from wct_tpu.models import vgg
        from wct_tpu.tools.normalize_encoder import (
            channel_means,
            normalize_encoder,
        )

        params = vgg.init_encoder_params(jax.random.PRNGKey(3))
        pool = rng.random((6, 32, 32, 3)).astype(np.float32)
        normed, report = normalize_encoder(params, pool, chunk=4)

        after = channel_means(normed, pool, chunk=4)
        for name, m in after.items():
            if name == "conv0":
                continue  # preprocessing conv stays untouched
            # channels at/near the dead floor keep scale 1 by design;
            # tiny-mean channels re-measure with fp noise amplified by
            # 1/mean, so gate the distribution: every live channel
            # within 10%, and 99% of them within 1%.
            live = np.abs(m[m > 1e-2] - 1.0)
            assert live.max() < 0.1, float(live.max())
            assert np.quantile(live, 0.99) < 1e-2, float(np.quantile(live, 0.99))
        # conv0 untouched
        np.testing.assert_array_equal(
            np.asarray(normed["conv0"]["w"]), np.asarray(params["conv0"]["w"])
        )
        # first normalised layer is an exact per-channel rescale of the
        # original (relu(s x) = s relu(x) for s > 0)
        import jax.numpy as jnp

        img = jnp.asarray(pool[:2])
        f_orig = np.asarray(vgg.encode(params, img, "relu1_1"))
        f_norm = np.asarray(vgg.encode(normed, img, "relu1_1"))
        s = np.asarray(normed["conv1_1"]["w"]) / np.where(
            np.asarray(params["conv1_1"]["w"]) == 0,
            1.0,
            np.asarray(params["conv1_1"]["w"]),
        )
        scale = s[0, 0, 0, :]  # per-output-channel
        np.testing.assert_allclose(
            f_norm, f_orig * scale[None, None, None, :], rtol=1e-4, atol=1e-5
        )

    def test_compensated_normalisation_preserves_function(self, rng):
        """Round-4 (VERDICT r3 item 1): normalize_bundle_compensated
        must keep every level's decode(encode(x)) EXACTLY (fp roundoff)
        while achieving unit mean activations — the Gatys rescale with
        next-conv / decoder-first-conv compensation."""
        import jax
        import jax.numpy as jnp

        from wct_tpu.models import cascade, decoder as dec_lib, vgg
        from wct_tpu.tools.normalize_encoder import (
            channel_means,
            normalize_bundle_compensated,
        )

        params = cascade.init_params(jax.random.PRNGKey(5))
        pool = rng.random((6, 32, 32, 3)).astype(np.float32)
        norm, report = normalize_bundle_compensated(params, pool, chunk=4)

        x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        for t in vgg.RELU_TARGETS:
            a = np.asarray(dec_lib.decode(
                params["decoders"][t], vgg.encode(params["encoder"], x, t), t
            ))
            b = np.asarray(dec_lib.decode(
                norm["decoders"][t], vgg.encode(norm["encoder"], x, t), t
            ))
            scale = max(1.0, np.abs(a).max())
            assert np.abs(a - b).max() < 1e-4 * scale, (
                t, np.abs(a - b).max(), scale
            )
        after = channel_means(norm["encoder"], pool, chunk=4)
        for name, m in after.items():
            if name == "conv0":
                continue
            live = np.abs(m[m > 1e-2] - 1.0)
            assert np.quantile(live, 0.99) < 1e-2, (name, live.max())

    def test_rms_mode_preserves_function_and_bounds_variance(self, rng):
        """Round-4 §4e: ``stat='rms'`` must (a) stay exactly function-
        preserving like the mean mode, (b) drive per-channel SECOND
        moments to 1, which (c) tames a deliberately spiky channel —
        the measured failure mode of joint reconstruction training
        (relu2_1 channel 86: mean ~1, sigma ~1600 -> one 2.6e6
        covariance eigenvalue wrecking the WCT spectrum mask)."""
        import jax
        import jax.numpy as jnp

        from wct_tpu.models import cascade, decoder as dec_lib, vgg
        from wct_tpu.tools.normalize_encoder import (
            normalize_bundle_compensated,
        )

        params = cascade.init_params(jax.random.PRNGKey(7))
        # Inject the pathology: one conv2_1 output channel scaled 500x
        # (scale is invisible to reconstruction loss, so training can
        # and did produce this).
        w = np.asarray(params["encoder"]["conv2_1"]["w"]).copy()
        b = np.asarray(params["encoder"]["conv2_1"]["b"]).copy()
        w[..., 3] *= 500.0
        b[3] *= 500.0
        params["encoder"]["conv2_1"]["w"] = jnp.asarray(w)
        params["encoder"]["conv2_1"]["b"] = jnp.asarray(b)

        pool = rng.random((6, 32, 32, 3)).astype(np.float32)
        norm, report = normalize_bundle_compensated(
            params, pool, chunk=4, stat="rms"
        )

        # (a) function-preserving vs the SPIKY input bundle
        x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        for t in vgg.RELU_TARGETS:
            a = np.asarray(dec_lib.decode(
                params["decoders"][t], vgg.encode(params["encoder"], x, t), t
            ))
            bb = np.asarray(dec_lib.decode(
                norm["decoders"][t], vgg.encode(norm["encoder"], x, t), t
            ))
            scale = max(1.0, np.abs(a).max())
            assert np.abs(a - bb).max() < 1e-4 * scale, (
                t, np.abs(a - bb).max(), scale
            )

        # (b)+(c) unit second moment at every relu target; the spiky
        # channel no longer dominates (pre-norm its second moment is
        # ~250000x its neighbours')
        for t in ("relu2_1", "relu3_1"):
            y = np.asarray(vgg.encode(norm["encoder"], jnp.asarray(pool), t))
            m2 = np.mean(np.square(y), axis=(0, 1, 2))
            live = m2[m2 > 1e-4]
            assert np.abs(live - 1.0).max() < 0.1, (t, live.min(), live.max())

        # invalid stat rejected loudly
        with pytest.raises(ValueError):
            normalize_bundle_compensated(params, pool, chunk=4, stat="max")
