"""Decoder training CLI — the rebuild of reference train.py (C12).

    python -m wct_tpu.cli.train --relu-target relu3_1 \
        --content-path /data/coco --checkpoint-dir ckpt/relu3_1 \
        --encoder-weights vgg.npz --max-iter 80000

Trains ONE decoder per invocation (as the reference does; run once per
relu target). Uses the async device prefetcher, optional multi-chip
data parallelism (--data-parallel), periodic npz checkpoints with
resume, and JSONL metric logs (TensorBoard-free observability).
``--synthetic`` trains on procedural images when no dataset is
available (smoke/bringup).
"""

from __future__ import annotations

import argparse
import json
import signal
import threading
import time
from pathlib import Path

import jax
import numpy as np

from wct_tpu.models import vgg
from wct_tpu.parallel import mesh as mesh_lib
from wct_tpu.train import (
    DevicePrefetcher,
    TrainConfig,
    TrainState,
    batch_generator,
    checkpoint,
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
    synthetic_batches,
    train_step,
)
from wct_tpu.utils import images


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--relu-target", default="relu4_1")
    p.add_argument("--content-path", default=None, help="training image dir")
    p.add_argument("--val-path", default=None, help="validation image dir")
    p.add_argument("--synthetic", action="store_true",
                   help="procedural training images (no dataset needed)")
    p.add_argument("--synthetic-pool", type=int, default=0,
                   help="pre-generate this many procedural images and "
                        "sample+augment from the pool (keeps the host "
                        "ahead of the device; 0 = generate fresh)")
    p.add_argument("--encoder-weights", default=None,
                   help="npz with encoder params (or bundle with 'encoder'); "
                        "omit for random encoder (smoke test)")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-decoder", default=None,
                   help="npz with decoder init params (a single decoder "
                        "tree, or {relu_target: tree} as written by "
                        "scripts/solve_layerwise.py); applies at step 0 "
                        "only — --resume takes precedence")
    p.add_argument("--ckpt-format", choices=["npz", "orbax"], default="npz",
                   help="training-state backend: npz = single "
                        "state_latest.npz; orbax = step-indexed dirs "
                        "with retention (roll back a bad step)")
    p.add_argument("--ckpt-keep", type=int, default=3,
                   help="orbax: number of recent step checkpoints kept")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop-size", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--lr-decay", type=float, default=5e-5)
    p.add_argument("--max-iter", type=int, default=160_000)
    p.add_argument("--save-iter", type=int, default=5_000)
    p.add_argument("--summary-iter", type=int, default=100)
    p.add_argument("--pixel-weight", type=float, default=1.0)
    p.add_argument("--feature-weight", type=float, default=1.0)
    p.add_argument(
        "--grad-clip", type=float, default=0.0,
        help="global-norm gradient clip (0 = off); stateless, so "
        "--resume across a clip change keeps the Adam moments",
    )
    p.add_argument(
        "--feature-norm", action="store_true",
        help="normalize the feature L2 by the target features' mean "
        "square (scale-free; ~no-op for the reference's normalised VGG, "
        "essential for unnormalised encoders)",
    )
    p.add_argument("--tv-weight", type=float, default=0.0)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard event files (needs the "
                        "bundled tensorflow; JSONL metrics always written)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize forward activations in the backward "
                        "pass (fits larger crops/batches in HBM)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _load_encoder(args) -> dict:
    if args.encoder_weights:
        tree = checkpoint.load_pytree(args.encoder_weights)
        return tree["encoder"] if "encoder" in tree else tree
    print("[train] NOTE: random encoder weights (smoke test)")
    return vgg.init_encoder_params(jax.random.PRNGKey(args.seed))


def main(argv=None) -> None:
    args = parse_args(argv)
    from wct_tpu.cli import common

    common.enable_compile_cache()
    cfg = TrainConfig(
        relu_target=args.relu_target,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        lr_decay=args.lr_decay,
        pixel_weight=args.pixel_weight,
        feature_weight=args.feature_weight,
        feature_norm=args.feature_norm,
        grad_clip=args.grad_clip,
        tv_weight=args.tv_weight,
        crop_size=args.crop_size,
        max_iter=args.max_iter,
        save_iter=args.save_iter,
        summary_iter=args.summary_iter,
        compute_dtype=args.dtype,
        remat=args.remat,
    )
    ckpt_dir = Path(args.checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    enc_params = _load_encoder(args)

    state = init_train_state(jax.random.PRNGKey(args.seed + 1), cfg)
    if args.init_decoder:
        # Closed-form layerwise init (train/layerwise.py): fresh Adam
        # moments over the solved params. A later --resume restore
        # overrides this (the resumed state already embeds it).
        tree = checkpoint.load_pytree(args.init_decoder)
        if args.relu_target in tree:
            tree = tree[args.relu_target]
        state = TrainState(
            params=tree,
            opt_state=make_optimizer(cfg).init(tree),
            step=jax.numpy.int32(0),
        )
        print(f"[train] initialized decoder from {args.init_decoder}")
    start_step = 0
    ckptr = checkpoint.TrainCheckpointer(
        ckpt_dir, fmt=args.ckpt_format, keep=args.ckpt_keep
    )
    if args.resume:
        tree = ckptr.restore_latest()
        if tree is not None:
            state = TrainState(
                params=tree["params"], opt_state=state.opt_state, step=tree["step"]
            )
            # Rebuild opt state from saved moments when present.
            if "opt_state" in tree:
                state = TrainState(
                    params=tree["params"],
                    opt_state=jax.tree.unflatten(
                        jax.tree.structure(make_optimizer(cfg).init(tree["params"])),
                        jax.tree.leaves(tree["opt_state"]),
                    ),
                    step=tree["step"],
                )
            start_step = int(state.step)
            print(f"[train] resumed ({args.ckpt_format}) at step {start_step}")

    batches = None
    use_device_pool = False
    if args.synthetic or not args.content_path:
        if not args.synthetic:
            print("[train] NOTE: no --content-path; using synthetic images")
        # Pooled synthetic data lives ON DEVICE (sampling + augmentation
        # jitted); decided after the sharding is known — see below.
        use_device_pool = args.synthetic_pool > 0
        if not use_device_pool:
            batches = synthetic_batches(
                cfg.batch_size, cfg.crop_size, args.seed, pool_size=0
            )
    else:
        paths = images.get_files(args.content_path)
        print(f"[train] {len(paths)} training images")
        batches = batch_generator(paths, cfg.batch_size, cfg.crop_size, args.seed)

    if args.data_parallel and len(jax.devices()) > 1:
        mesh = mesh_lib.create_mesh()
        step_fn = make_sharded_train_step(mesh, cfg)
        sharding = mesh_lib.batch_sharding(mesh)
        print(f"[train] data-parallel over {len(mesh.devices)} devices")
    else:
        step_fn = lambda s, e, b: train_step(s, e, b, cfg)
        sharding = None

    # Fixed validation batch (reference train.py's val summaries):
    # center crops from --val-path, evaluated every summary_iter.
    val_batch = None
    if args.val_path:
        val_paths = images.list_images(args.val_path)[: cfg.batch_size]
        if not val_paths:
            print(f"[train] WARNING: no images under --val-path {args.val_path}; "
                  "validation disabled")
        else:
            val_batch = jax.numpy.asarray(
                np.stack(
                    [
                        images.center_crop(images.get_img(p), cfg.crop_size)
                        for p in val_paths
                    ]
                )
            )
            print(f"[train] validating on {len(val_paths)} images")

    # Save-on-signal (SURVEY.md §5 failure-recovery row): SIGTERM/SIGINT
    # sets a flag; the loop checkpoints and exits cleanly so a preempted
    # run resumes from its exact step instead of the last --save-iter.
    # Handlers are restored on exit (in-process callers keep Ctrl+C) and
    # skipped off the main thread (signal.signal would raise there).
    stop_requested = False

    def _request_stop(signum, frame):  # noqa: ARG001
        nonlocal stop_requested
        stop_requested = True
        print(f"[train] signal {signum}: checkpointing and stopping")

    prev_handlers = {}
    if threading.current_thread() is threading.main_thread():
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _request_stop)

    tb_writer = None
    if args.tensorboard:
        from wct_tpu.utils.tb import SummaryWriter

        tb_writer = SummaryWriter(ckpt_dir / "tb")
        if not tb_writer.active:
            print("[train] tensorboard requested but TF unavailable; skipping")

    if use_device_pool and sharding is not None:
        # DP keeps the host prefetch path (the pool would need
        # per-device sharding); single-device gets the resident pool.
        print(
            "[train] NOTE: --synthetic-pool device residency is disabled "
            "under --data-parallel (pool would need per-device sharding); "
            "falling back to host prefetch — expect host-I/O-bound "
            "throughput (ADVICE r2)"
        )
        use_device_pool = False
        batches = synthetic_batches(
            cfg.batch_size, cfg.crop_size, args.seed,
            pool_size=args.synthetic_pool,
        )
    if use_device_pool:
        from wct_tpu.train.data import device_pool_batches, synthetic_pool

        pool_np = synthetic_pool(
            np.random.default_rng(args.seed), args.synthetic_pool,
            cfg.crop_size,
        )
        print(
            f"[train] device-resident pool: {args.synthetic_pool} images "
            f"({pool_np.nbytes / 1e6:.0f} MB uploaded once), on-device "
            "sampling + augmentation"
        )
        prefetch = device_pool_batches(
            pool_np, cfg.batch_size, args.seed, start_step=start_step
        )
    else:
        # depth 4 (not classic double buffering): the tunnel's H2D
        # bandwidth fluctuates several-fold over seconds (measured r2:
        # 25–98 img/s summary windows); a deeper queue rides the stalls.
        prefetch = DevicePrefetcher(batches, depth=4, sharding=sharding)
    log_file = (ckpt_dir / "metrics.jsonl").open("a")
    t0 = time.time()
    try:
        for batch in prefetch:
            state, metrics = step_fn(state, enc_params, batch)
            step = int(state.step)
            if step % cfg.summary_iter == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                # Throughput measured BEFORE the val pass so --val-path
                # doesn't deflate the training img/s metric.
                m["img_per_sec"] = (
                    cfg.batch_size * cfg.summary_iter / max(time.time() - t0, 1e-9)
                )
                if val_batch is not None:
                    from wct_tpu.train import eval_step

                    val = eval_step(state.params, enc_params, val_batch, cfg)
                    m.update({f"val_{k}": float(v) for k, v in val.items()})
                t0 = time.time()
                log_file.write(json.dumps(m) + "\n")
                log_file.flush()
                if tb_writer is not None and tb_writer.active:
                    tb_writer.scalars(step, {k: v for k, v in m.items() if k != "step"})
                print(
                    f"step {step}: loss {m['loss']:.4f} "
                    f"(pixel {m['pixel']:.4f}, feature {m['feature']:.4f}) "
                    f"{m['img_per_sec']:.1f} img/s"
                )
            if step % cfg.save_iter == 0 or step >= cfg.max_iter or stop_requested:
                if val_batch is not None:
                    # Reference train.py logs reconstruction images to
                    # TensorBoard; here they land as PNGs next to the ckpt.
                    from wct_tpu.models import decoder as dec_lib

                    code = vgg.encode(enc_params, val_batch, cfg.relu_target)
                    decoded = np.asarray(
                        dec_lib.decode(state.params, code, cfg.relu_target),
                        dtype=np.float32,
                    )
                    for i, img in enumerate(decoded[:4]):
                        images.save_img(
                            ckpt_dir / f"val_recon_{i}_step{step}.png", img
                        )
                ckptr.save(
                    step,
                    {
                        "params": state.params,
                        "opt_state": state.opt_state,
                        "step": state.step,
                    },
                )
                checkpoint.save_pytree(
                    ckpt_dir / f"decoder_{cfg.relu_target}.npz", state.params
                )
            if step >= cfg.max_iter or stop_requested:
                break
    finally:
        ckptr.close()
        # Restore prior handlers so in-process callers (tests,
        # notebooks) keep a working Ctrl+C after main() returns.
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
    print(f"[train] done at step {int(state.step)}; decoder saved to {ckpt_dir}")


if __name__ == "__main__":
    main()
