#!/usr/bin/env python
"""Joint cascade polish: fine-tune all five decoders on the composed
alpha=0 objective.

    python scripts/cascade_polish.py --encoder ckpt_r3w/enc/encoder_crelu.npz \
        --decoders ckpt_r3w/decoders_best.npz --out ckpt_r3w/decoders_polished.npz

Per-level training optimizes each decoder against CLEAN encoder
features; in the cascade, level i's encoder sees level i+1's DECODED
output (artifacts included), a distribution no per-level run ever
trained on. This script descends the actual composed metric —
``MSE(cascade_alpha0(x), x)`` over relu5_1→relu1_1, exactly the
fidelity gate's recipe — plus per-level reconstruction ANCHORS
(weight --anchor) so the per-level PSNR floors don't degrade while the
composition improves.

The reference has no counterpart (its decoders are only ever trained
per level, train.py:~1-200 reconstructed); this is an extra round-3
quality stage for the stand-in bundle, recorded in weights/README.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--decoders", required=True,
                    help="npz with {relu_target: decoder tree}")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--lr-decay", type=float, default=2e-5)
    ap.add_argument("--anchor", type=float, default=0.25,
                    help="weight of the per-level reconstruction "
                         "anchors vs the composed cascade loss")
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--eval-iter", type=int, default=250)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import device_pool_batches, synthetic_image, synthetic_pool

    enable_compile_cache()
    enc = checkpoint.load_pytree(args.encoder)
    enc = enc["encoder"] if "encoder" in enc else enc
    decoders = checkpoint.load_pytree(args.decoders)
    targets = tuple(reversed(vgg.RELU_TARGETS))  # relu5_1 → relu1_1

    def cascade_a0(decs, x):
        """alpha=0 cascade, no intermediate clip (models/cascade.py
        semantics: one clip at the end only)."""
        img = x
        for t in targets:
            f = vgg.encode(enc, img, t)
            img = dec_lib.decode(decs[t], f, t)
        return img

    def loss_fn(decs, batch):
        x = batch.astype(jnp.float32) / 255.0
        casc = jnp.mean((cascade_a0(decs, x) - x) ** 2)
        anchors = 0.0
        for t in targets:
            f = vgg.encode(enc, x, t)
            anchors += jnp.mean((dec_lib.decode(decs[t], f, t) - x) ** 2)
        return casc + args.anchor * anchors, (casc, anchors)

    sched = lambda step: args.lr / (1.0 + args.lr_decay * step)
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )
    opt_state = tx.init(decoders)

    @jax.jit
    def step_fn(decs, opt_state, batch):
        (loss, (casc, anch)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(decs, batch)
        updates, opt_state = tx.update(grads, opt_state, decs)
        decs = optax.apply_updates(decs, updates)
        return decs, opt_state, loss, casc, anch

    rng = np.random.default_rng(args.seed)
    print(f"pool: {args.pool} x {args.size}px ...", flush=True)
    pool_np = synthetic_pool(rng, args.pool, args.size)
    batches = device_pool_batches(pool_np, args.batch, args.seed)

    erng = np.random.default_rng(12345)
    held = np.stack([synthetic_image(erng, args.size) for _ in range(8)])
    held_j = jnp.asarray(held)

    @jax.jit
    def eval_cascade(decs):
        out = jnp.clip(cascade_a0(decs, held_j), 0.0, 1.0)
        return jnp.mean((out - held_j) ** 2)

    def eval_db(decs):
        return float(-10 * np.log10(float(eval_cascade(decs))))

    best_db = eval_db(decoders)
    best = decoders
    print(f"init alpha=0 cascade: {best_db:.2f} dB", flush=True)
    log_path = Path(args.out).with_suffix(".log.jsonl")
    t0 = time.time()
    for step, batch in zip(range(1, args.steps + 1), batches):
        decoders, opt_state, loss, casc, anch = step_fn(
            decoders, opt_state, batch)
        if step % args.eval_iter == 0:
            db = eval_db(decoders)
            rec = {"step": step, "loss": float(loss), "cascade": float(casc),
                   "anchors": float(anch), "held_db": db,
                   "img_per_sec": args.batch * args.eval_iter
                   / max(time.time() - t0, 1e-9)}
            t0 = time.time()
            log_path.open("a").write(json.dumps(rec) + "\n")
            print(f"step {step}: loss {rec['loss']:.4f} "
                  f"(cascade {rec['cascade']:.4f}) held {db:.2f} dB "
                  f"{rec['img_per_sec']:.1f} img/s", flush=True)
            if db > best_db:
                best_db, best = db, decoders
    checkpoint.save_pytree(args.out, best)
    print(f"saved best ({best_db:.2f} dB) -> {args.out}", flush=True)

    print("\nper-level reconstruction after polish (held-out):")
    for t in vgg.RELU_TARGETS:
        f = vgg.encode(enc, held_j, t)
        dec = np.clip(np.asarray(dec_lib.decode(best[t], f, t)), 0, 1)
        mse = np.mean((dec.astype(np.float64) - held) ** 2)
        print(f"  {t}: {10 * np.log10(1.0 / mse):.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
