"""CLI end-to-end smoke tests on CPU with tiny images."""

import numpy as np
import pytest

from wct_tpu.utils import images


@pytest.fixture
def tiny_imgs(tmp_path, rng):
    c_dir = tmp_path / "content"
    s_dir = tmp_path / "style"
    o_dir = tmp_path / "out"
    c_dir.mkdir()
    s_dir.mkdir()
    images.save_img(c_dir / "c1.png", rng.random((40, 48, 3)))
    images.save_img(s_dir / "s1.png", rng.random((32, 32, 3)))
    images.save_img(s_dir / "s2.png", rng.random((32, 32, 3)))
    return c_dir, s_dir, o_dir


def test_stylize_cli_end_to_end(tiny_imgs):
    from wct_tpu.cli import stylize as cli

    c_dir, s_dir, o_dir = tiny_imgs
    cli.main(
        [
            "--content-path", str(c_dir),
            "--style-path", str(s_dir),
            "--out-path", str(o_dir),
            "--relu-targets", "relu2_1", "relu1_1",
            "--content-size", "32",
            "--alpha", "0.7",
        ]
    )
    outs = images.get_files(o_dir)
    assert len(outs) == 2  # 1 content × 2 styles
    img = images.get_img(outs[0])
    assert img.shape[2] == 3 and np.isfinite(img).all()


def test_stylize_cli_data_parallel(tiny_imgs):
    # Shards each batch over the 8-virtual-device CPU mesh.
    from wct_tpu.cli import stylize as cli

    c_dir, s_dir, o_dir = tiny_imgs
    cli.main(
        [
            "--content-path", str(c_dir),
            "--style-path", str(s_dir),
            "--out-path", str(o_dir),
            "--relu-targets", "relu1_1",
            "--content-size", "32",
            "--batch-size", "8",
            "--data-parallel",
        ]
    )
    outs = images.get_files(o_dir)
    assert len(outs) == 2
    assert np.isfinite(images.get_img(outs[0])).all()


def test_stylize_cli_data_parallel_bad_batch(tiny_imgs):
    from wct_tpu.cli import stylize as cli

    c_dir, s_dir, o_dir = tiny_imgs
    with pytest.raises(SystemExit, match="multiple of the device count"):
        cli.main(
            [
                "--content-path", str(c_dir),
                "--style-path", str(s_dir),
                "--out-path", str(o_dir),
                "--relu-targets", "relu1_1",
                "--batch-size", "3",
                "--data-parallel",
            ]
        )


def test_stylize_cli_interp_and_keep_colors(tiny_imgs):
    from wct_tpu.cli import stylize as cli

    c_dir, s_dir, o_dir = tiny_imgs
    cli.main(
        [
            "--content-path", str(c_dir),
            "--style-path", str(s_dir),
            "--out-path", str(o_dir),
            "--relu-targets", "relu1_1",
            "--content-size", "32",
            "--interp-weights", "0.3", "0.7",
            "--keep-colors",
        ]
    )
    outs = images.get_files(o_dir)
    assert len(outs) == 1  # interpolation = one output per content
    assert "interp" in outs[0]


def test_stylize_cli_wrong_interp_weights(tiny_imgs):
    from wct_tpu.cli import stylize as cli

    c_dir, s_dir, o_dir = tiny_imgs
    with pytest.raises(SystemExit):
        cli.main(
            [
                "--content-path", str(c_dir),
                "--style-path", str(s_dir),
                "--out-path", str(o_dir),
                "--relu-targets", "relu1_1",
                "--interp-weights", "1.0",  # 2 styles, 1 weight
            ]
        )


def test_preset_overrides_dtype_and_method(tiny_imgs):
    from wct_tpu.cli import common

    import argparse

    p = argparse.ArgumentParser()
    common.add_model_flags(p)
    args = p.parse_args(["--preset", "throughput"])
    cfg = common.config_from_args(args)
    assert cfg.compute_dtype == "bfloat16" and cfg.method == "newton_schulz_fast"
    args = p.parse_args(["--preset", "balanced"])
    cfg = common.config_from_args(args)
    assert cfg.compute_dtype == "float32" and cfg.method == "auto"


def test_rel_trunc_flag_plumbs_to_config():
    import argparse

    from wct_tpu.cli import common

    p = argparse.ArgumentParser()
    common.add_model_flags(p)
    args = p.parse_args(["--rel-trunc", "1e-3"])
    cfg = common.config_from_args(args)
    assert cfg.rel_trunc == 1e-3
    assert common.config_from_args(p.parse_args([])).rel_trunc is None


def test_preset_throughput_with_explicit_fold():
    """An explicit --fold wins over the preset's pack2 (ADVICE.md r1):
    the combination must build a valid config, not trip CascadeConfig's
    pack2/fold mutual-exclusion check."""
    import argparse

    from wct_tpu.cli import common

    p = argparse.ArgumentParser()
    common.add_model_flags(p)
    args = p.parse_args(["--preset", "throughput", "--fold"])
    cfg = common.config_from_args(args)
    assert cfg.fold_transform and not cfg.pack2_junction
    # --no-fold keeps the preset's pack2
    args = p.parse_args(["--preset", "throughput", "--no-fold"])
    cfg = common.config_from_args(args)
    assert cfg.pack2_junction and not cfg.fold_transform


def test_train_cli_synthetic(tmp_path):
    from wct_tpu.cli import train as cli

    ckpt = tmp_path / "ckpt"
    cli.main(
        [
            "--relu-target", "relu1_1",
            "--synthetic",
            "--checkpoint-dir", str(ckpt),
            "--batch-size", "2",
            "--crop-size", "32",
            "--max-iter", "4",
            "--save-iter", "4",
            "--summary-iter", "2",
        ]
    )
    assert (ckpt / "state_latest.npz").exists()
    assert (ckpt / "decoder_relu1_1.npz").exists()
    assert (ckpt / "metrics.jsonl").read_text().strip()


def test_train_cli_val_path(tmp_path, rng):
    from wct_tpu.cli import train as cli

    val_dir = tmp_path / "val"
    val_dir.mkdir()
    for i in range(2):
        images.save_img(val_dir / f"v{i}.png", rng.random((40, 40, 3)))
    ckpt = tmp_path / "ckpt"
    cli.main(
        [
            "--relu-target", "relu1_1",
            "--synthetic",
            "--val-path", str(val_dir),
            "--checkpoint-dir", str(ckpt),
            "--batch-size", "2",
            "--crop-size", "32",
            "--max-iter", "2",
            "--save-iter", "2",
            "--summary-iter", "2",
        ]
    )
    import json

    rows = [
        json.loads(line)
        for line in (ckpt / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("val_loss" in r for r in rows)
    # Val reconstruction image summaries land beside the checkpoint.
    assert list(ckpt.glob("val_recon_*_step*.png"))


def test_train_cli_save_on_signal(tmp_path):
    """SIGTERM mid-run → clean checkpoint + exit 0 (preemption safety)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    import pathlib

    import wct_tpu

    ckpt = tmp_path / "ckpt"
    # The axon TPU plugin (on PYTHONPATH) ignores JAX_PLATFORMS=cpu, so
    # the subprocess would silently train on the shared TPU (slow first
    # compile → flaky timeouts). Strip the plugin path to force CPU.
    repo_root = str(pathlib.Path(wct_tpu.__file__).resolve().parent.parent)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "wct_tpu.cli.train",
            "--relu-target", "relu1_1",
            "--synthetic",
            "--checkpoint-dir", str(ckpt),
            "--batch-size", "2",
            "--crop-size", "32",
            "--max-iter", "100000",
            "--save-iter", "100000",
            "--summary-iter", "5",
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    # Generous deadline: under heavy host load (e.g. a concurrent TPU
    # training job compiling) the first CPU summary step can take minutes.
    deadline = time.time() + 420
    metrics = ckpt / "metrics.jsonl"
    while time.time() < deadline and not metrics.exists():
        time.sleep(0.5)
        if proc.poll() is not None:
            raise AssertionError(f"train exited early:\n{proc.stdout.read()}")
    assert metrics.exists(), "training never reached a summary step"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out
    assert (ckpt / "state_latest.npz").exists()
    assert "checkpointing and stopping" in out


def test_train_cli_resume(tmp_path):
    from wct_tpu.cli import train as cli

    ckpt = tmp_path / "ckpt"
    common = [
        "--relu-target", "relu1_1",
        "--synthetic",
        "--checkpoint-dir", str(ckpt),
        "--batch-size", "2",
        "--crop-size", "32",
        "--save-iter", "2",
        "--summary-iter", "2",
    ]
    cli.main(common + ["--max-iter", "2"])
    cli.main(common + ["--max-iter", "4", "--resume"])
    import json

    steps = [
        json.loads(line)["step"]
        for line in (ckpt / "metrics.jsonl").read_text().splitlines()
    ]
    assert max(steps) >= 4


def test_train_cli_resume_orbax(tmp_path):
    from wct_tpu.cli import train as cli

    ckpt = tmp_path / "ckpt"
    common = [
        "--relu-target", "relu1_1",
        "--synthetic",
        "--checkpoint-dir", str(ckpt),
        "--batch-size", "2",
        "--crop-size", "32",
        "--save-iter", "2",
        "--summary-iter", "2",
        "--ckpt-format", "orbax",
    ]
    cli.main(common + ["--max-iter", "2"])
    assert (ckpt / "orbax").is_dir()
    cli.main(common + ["--max-iter", "4", "--resume"])
    import json

    steps = [
        json.loads(line)["step"]
        for line in (ckpt / "metrics.jsonl").read_text().splitlines()
    ]
    assert max(steps) >= 4
    # Resume continued from step 2 rather than restarting from 0.
    assert {2, 4} <= set(steps)


def test_trained_decoder_loads_into_stylize(tmp_path, rng):
    """Train a decoder, bundle it with the encoder, stylize with it."""
    import jax

    from wct_tpu.cli import stylize as s_cli
    from wct_tpu.cli import train as t_cli
    from wct_tpu.models import vgg
    from wct_tpu.train import checkpoint

    ckpt = tmp_path / "ckpt"
    t_cli.main(
        [
            "--relu-target", "relu1_1",
            "--synthetic",
            "--checkpoint-dir", str(ckpt),
            "--batch-size", "2",
            "--crop-size", "32",
            "--max-iter", "2",
            "--save-iter", "2",
        ]
    )
    dec = checkpoint.load_pytree(ckpt / "decoder_relu1_1.npz")
    enc = vgg.init_encoder_params(jax.random.PRNGKey(0))
    bundle = tmp_path / "bundle.npz"
    checkpoint.save_pytree(bundle, {"encoder": enc, "decoders": {"relu1_1": dec}})

    c_dir = tmp_path / "content"
    c_dir.mkdir()
    images.save_img(c_dir / "c.png", rng.random((32, 32, 3)))
    o_dir = tmp_path / "out"
    s_cli.main(
        [
            "--weights", str(bundle),
            "--content-path", str(c_dir),
            "--style-path", str(c_dir),
            "--out-path", str(o_dir),
            "--relu-targets", "relu1_1",
        ]
    )
    assert len(images.get_files(o_dir)) == 1


def test_stylize_cli_per_level_checkpoints(tmp_path, rng):
    """Reference-style loading: --vgg-path + one --checkpoints npz per
    --relu-targets entry (stylize.py:~60 restored one Saver dir per
    level — here the converted npz equivalents)."""
    import jax

    from wct_tpu.cli import stylize as s_cli
    from wct_tpu.models import decoder as dec_lib, vgg
    from wct_tpu.train import checkpoint

    enc_npz = tmp_path / "encoder.npz"
    checkpoint.save_pytree(
        enc_npz, {"encoder": vgg.init_encoder_params(jax.random.PRNGKey(0))}
    )
    ckpts = []
    for i, t in enumerate(("relu2_1", "relu1_1")):
        p = tmp_path / f"decoder_{t}.npz"
        checkpoint.save_pytree(
            p, dec_lib.init_decoder_params(jax.random.PRNGKey(i + 1), t)
        )
        ckpts.append(str(p))

    c_dir = tmp_path / "content"
    c_dir.mkdir()
    images.save_img(c_dir / "c.png", rng.random((32, 32, 3)))
    o_dir = tmp_path / "out"
    s_cli.main(
        [
            "--vgg-path", str(enc_npz),
            "--checkpoints", *ckpts,
            "--relu-targets", "relu2_1", "relu1_1",
            "--content-path", str(c_dir),
            "--style-path", str(c_dir),
            "--out-path", str(o_dir),
        ]
    )
    assert len(images.get_files(o_dir)) == 1
    # count mismatch fails loudly
    with pytest.raises(SystemExit, match="pair by position"):
        s_cli.main(
            [
                "--vgg-path", str(enc_npz),
                "--checkpoints", ckpts[0],
                "--relu-targets", "relu2_1", "relu1_1",
                "--content-path", str(c_dir),
                "--style-path", str(c_dir),
                "--out-path", str(o_dir),
            ]
        )


def test_stream_cli_offline_video(tmp_path, rng):
    """Offline video conversion: every frame processed, batched."""
    cv2 = pytest.importorskip("cv2")
    from wct_tpu.cli import stream as cli

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    for _ in range(7):
        w.write((rng.random((32, 48, 3)) * 255).astype(np.uint8))
    w.release()

    s_dir = tmp_path / "style"
    s_dir.mkdir()
    images.save_img(s_dir / "s.png", rng.random((32, 32, 3)))
    out = str(tmp_path / "out.mp4")
    cli.main(
        [
            "--video", src,
            "--out", out,
            "--style-path", str(s_dir),
            "--style-size", "32",
            "--width", "48",
            "--height", "32",
            "--relu-targets", "relu1_1",
            "--no-display",
            "--batch-size", "4",
        ]
    )
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 7  # no frames dropped in offline mode


def test_stylize_cli_batching_groups_shapes(tmp_path, rng):
    from wct_tpu.cli import stylize as cli

    c_dir = tmp_path / "content"
    s_dir = tmp_path / "style"
    c_dir.mkdir()
    s_dir.mkdir()
    for i in range(3):
        images.save_img(c_dir / f"a{i}.png", rng.random((32, 32, 3)))
    images.save_img(c_dir / "wide.png", rng.random((32, 48, 3)))
    images.save_img(s_dir / "s.png", rng.random((32, 32, 3)))
    o_dir = tmp_path / "out"
    cli.main(
        [
            "--content-path", str(c_dir),
            "--style-path", str(s_dir),
            "--out-path", str(o_dir),
            "--relu-targets", "relu1_1",
            "--batch-size", "2",
        ]
    )
    assert len(images.get_files(o_dir)) == 4


class TestStreamEngine:
    def test_process_frames_with_cached_style(self, rng):
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        eng = StreamStylizer(params, cfg, 32, 32)
        eng.set_style(rng.random((32, 32, 3)).astype(np.float32))
        out1 = eng.process(rng.random((32, 32, 3)).astype(np.float32))
        # Differently-sized frame gets resized to the fixed shape.
        out2 = eng.process(rng.random((48, 64, 3)).astype(np.float32))
        assert out1.shape == out2.shape == (32, 32, 3)

    def test_interpolation_weights_live(self, rng):
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu1_1",))
        eng = StreamStylizer(params, cfg, 32, 32)
        s1 = rng.random((32, 32, 3)).astype(np.float32)
        s2 = rng.random((32, 32, 3)).astype(np.float32)
        eng.set_styles_interpolated([s1, s2], np.array([1.0, 0.0]))
        frame = rng.random((32, 32, 3)).astype(np.float32)
        out_a = eng.process(frame)
        eng.set_interp_weights(np.array([0.0, 1.0]))
        out_b = eng.process(frame)
        assert not np.allclose(out_a, out_b)

    def test_no_style_raises(self, rng):
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        eng = StreamStylizer(
            params, cascade.CascadeConfig(relu_targets=("relu1_1",)), 32, 32
        )
        with pytest.raises(RuntimeError, match="no style"):
            eng.process(rng.random((32, 32, 3)).astype(np.float32))

    def test_pipelined_matches_strict_in_order(self, rng):
        """submit-ahead/sync-behind returns the SAME outputs as strict
        per-frame processing, shifted by pipeline_depth, and drains."""
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        eng = StreamStylizer(params, cfg, 32, 32)
        eng.set_style(rng.random((32, 32, 3)).astype(np.float32))
        frames = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(4)]

        strict = [eng.process(f) for f in frames]
        piped = [eng.process_pipelined(f) for f in frames]
        assert piped[0] is None  # priming
        while (tail := eng.collect()) is not None:
            piped.append(tail)
        piped = [p for p in piped if p is not None]
        assert len(piped) == len(strict)
        for a, b in zip(strict, piped):
            np.testing.assert_array_equal(a, b)
        assert eng.n_pending == 0

    def test_frame_batch_matches_strict_in_order(self, rng):
        """frame_batch=2 grouping returns the SAME outputs as strict
        per-frame processing (bitwise batch stability), in order, and
        the drain flushes the odd partial group without losing frames."""
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu2_1", "relu1_1"))
        eng = StreamStylizer(params, cfg, 32, 32, frame_batch=2)
        eng.set_style(rng.random((32, 32, 3)).astype(np.float32))
        # 7 frames: three full pairs + one padded partial group
        frames = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(7)]

        strict = [eng.process(f) for f in frames]
        piped = [eng.process_pipelined(f) for f in frames]
        while (tail := eng.collect()) is not None:
            piped.append(tail)
        piped = [p for p in piped if p is not None]
        assert len(piped) == len(strict)
        for a, b in zip(strict, piped):
            # Not bitwise: XLA does not guarantee batch-size invariance
            # of conv results on every backend, so the batch-1 strict
            # graph vs the batch-2 grouped graph may differ in the last
            # ulp on TPU (ADVICE r2). The end-to-end bitwise guarantee
            # lives in stylize_microbatched / bench/tpu_sanity.py.
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
        assert eng.n_pending == 0

    def test_frame_batch_settings_bind_at_group_start(self, rng):
        """A live alpha change between two buffered submits must NOT
        apply retroactively to the earlier frame of the group: settings
        snapshot when the group's first frame is submitted (ADVICE r2).
        Also: collect(flush=False) between submits must not dispatch a
        padded partial group."""
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu1_1",))
        style = rng.random((32, 32, 3)).astype(np.float32)
        frames = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(2)]

        strict = StreamStylizer(params, cfg, 32, 32)
        strict.set_style(style)
        strict.alpha = 0.3
        want = [strict.process(f) for f in frames]

        eng = StreamStylizer(params, cfg, 32, 32, frame_batch=2)
        eng.set_style(style)
        eng.alpha = 0.3
        eng.submit(frames[0])
        # poll mid-group: must return None WITHOUT dispatching padded
        assert eng.collect(flush=False) is None
        assert len(eng._pending) == 0 and len(eng._inbuf) == 1
        eng.alpha = 0.9  # takes effect from the NEXT group
        eng.submit(frames[1])
        got = [eng.collect(), eng.collect()]
        for a, b in zip(want, got):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)

    def test_uint8_readback_matches_host_quantization(self, rng):
        """Device-side uint8 quantization == clip(x,0,1)*255→uint8 on host."""
        import jax

        from wct_tpu.models import cascade
        from wct_tpu.utils.stream import StreamStylizer

        params = cascade.init_params(jax.random.PRNGKey(0))
        cfg = cascade.CascadeConfig(relu_targets=("relu1_1",))
        eng_f = StreamStylizer(params, cfg, 32, 32)
        eng_u = StreamStylizer(params, cfg, 32, 32, readback="uint8")
        style = rng.random((32, 32, 3)).astype(np.float32)
        eng_f.set_style(style)
        eng_u.set_style(style)
        frame = rng.random((32, 32, 3)).astype(np.float32)
        host_u8 = (np.clip(eng_f.process(frame), 0, 1) * 255).astype(np.uint8)
        dev_u8 = (np.clip(eng_u.process(frame), 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(host_u8, dev_u8)
