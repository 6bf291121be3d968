"""Per-level decoder trainer: optax Adam, pixel + feature + TV losses.

Rebuilds the reference's training mode (train.py + WCTModel('train'),
model.py:~145–250 / SURVEY.md C7, C12) TPU-first:

- pure-function loss: frozen encoder (params simply not differentiated)
  → decoder → re-encoder; pixel L2 + feature L2 (+ total variation),
  matching the reference's loss structure;
- one jitted ``train_step`` containing forward, backward, and the Adam
  update — the reference's ``sess.run(train_op)`` with feed_dict
  becomes a single compiled XLA program fed by an async host pipeline
  (``wct_tpu.train.data``);
- inverse-time learning-rate decay like the reference's
  ``tf.train.inverse_time_decay`` (defaults [verify] per SURVEY §A.1);
- data parallelism by construction: ``make_sharded_train_step`` shards
  the batch over a mesh and XLA inserts the gradient all-reduce over
  ICI (new scope vs the single-GPU reference).

Train one level per invocation (as the reference does); run five times
for the full decoder set.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wct_tpu.models import decoder as dec_lib
from wct_tpu.models import vgg


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static trainer config (reference train.py flags, SURVEY.md C12)."""

    relu_target: str = "relu4_1"
    batch_size: int = 8
    learning_rate: float = 1e-4
    lr_decay: float = 5e-5  # inverse-time decay rate
    pixel_weight: float = 1.0
    feature_weight: float = 1.0
    tv_weight: float = 0.0
    # Normalize the feature L2 by the (stop-gradient) mean square of the
    # TARGET features, making the term scale-free. With the reference's
    # normalised VGG (activations ~O(1) by construction — SURVEY §3.5)
    # the divisor is ≈1 and this is a near-no-op; with an unnormalised
    # encoder (e.g. the He-init stand-in, features O(100)) it stops the
    # feature term from swamping the pixel term by ~1e4–1e5×. Off by
    # default = exact reference objective (train.py:~120, plain L2).
    feature_norm: bool = False
    # Global-norm gradient clip (0 = off). Applied to the raw grads
    # BEFORE Adam (stateless rescale, so checkpointed optimizer state
    # stays resume-compatible). Motivated by measured loss spikes when
    # training the relu5_1 decoder (its feature term backprops through
    # a 10-conv re-encode): pixel MSE jumped 0.5 → 62 → 0.4 within 600
    # steps of an otherwise-converging run.
    grad_clip: float = 0.0
    crop_size: int = 256
    max_iter: int = 160_000
    save_iter: int = 5_000
    summary_iter: int = 100
    compute_dtype: str = "float32"
    # Rematerialize the encoder/decoder forward in the backward pass —
    # trades ~30% FLOPs for activation memory, enabling large crops /
    # batch on one chip (jax.checkpoint; new capability vs reference).
    remat: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def total_variation(x: jax.Array) -> jax.Array:
    """Anisotropic TV (L2) of images ``[B, H, W, C]``, mean per pixel."""
    dh = x[:, 1:, :, :] - x[:, :-1, :, :]
    dw = x[:, :, 1:, :] - x[:, :, :-1, :]
    return jnp.mean(dh.astype(jnp.float32) ** 2) + jnp.mean(
        dw.astype(jnp.float32) ** 2
    )


def reconstruction_loss(
    dec_params: Any,
    enc_params: Any,
    batch: jax.Array,
    cfg: TrainConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Pixel + feature (+ TV) loss for one decoder (reference model.py:~200).

    ``batch: [B, H, W, 3]`` in [0,1]. The encoder appears twice (encode
    and re-encode) but is never differentiated — only ``dec_params``
    flows to the optimizer, the TPU analogue of the reference keeping
    VGG out of TRAINABLE_VARIABLES.
    """
    target = cfg.relu_target
    # uint8 batches are normalized ON DEVICE: the host→HBM transfer then
    # moves a quarter of the bytes, which matters through the tunnel
    # (measured r2: 12.6 MB f32 H2D per b16/256px step dominated the
    # step time on a 1-core host; see synthetic_batches pool path).
    x = batch.astype(cfg.dtype)
    if batch.dtype == jnp.uint8:
        x = x / jnp.asarray(255.0, cfg.dtype)
    encode = lambda p, img: vgg.encode(p, img, target)
    decode = lambda p, f: dec_lib.decode(p, f, target)
    if cfg.remat:
        encode = jax.checkpoint(encode)
        decode = jax.checkpoint(decode)
    code = encode(enc_params, x)
    decoded = decode(dec_params, code)

    pixel = jnp.mean((decoded.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
    if cfg.feature_weight:
        recode = encode(enc_params, decoded)
        feature = jnp.mean(
            (recode.astype(jnp.float32) - code.astype(jnp.float32)) ** 2
        )
        if cfg.feature_norm:
            power = jax.lax.stop_gradient(
                jnp.mean(code.astype(jnp.float32) ** 2)
            )
            feature = feature / (power + 1e-8)
    else:
        # feature_weight 0 ⇒ skip the re-encode entirely: at relu5_1 the
        # re-encode is a second 10-conv forward (and its backward), so a
        # pixel-only phase trains ~2× faster (round-3 schedule lever).
        feature = jnp.float32(0.0)
    tv = total_variation(decoded) if cfg.tv_weight else jnp.float32(0.0)

    total = (
        cfg.pixel_weight * pixel + cfg.feature_weight * feature + cfg.tv_weight * tv
    )
    return total, {"loss": total, "pixel": pixel, "feature": feature, "tv": tv}


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with inverse-time lr decay (reference train.py lr schedule)."""
    schedule = lambda step: cfg.learning_rate / (1.0 + cfg.lr_decay * step)
    return optax.adam(schedule)


def clip_grads(grads, cfg: TrainConfig):
    """Stateless global-norm clip (no-op when cfg.grad_clip == 0)."""
    if cfg.grad_clip < 0:
        raise ValueError(f"grad_clip must be >= 0, got {cfg.grad_clip}")
    if not cfg.grad_clip:
        return grads
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, cfg.grad_clip / jnp.maximum(gnorm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads)


@dataclasses.dataclass
class TrainState:
    """Mutable-by-replacement training state pytree."""

    params: Any
    opt_state: Any
    step: jax.Array

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def init_train_state(key: jax.Array, cfg: TrainConfig) -> TrainState:
    params = dec_lib.init_decoder_params(key, cfg.relu_target)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(
    dec_params: Any,
    enc_params: Any,
    batch: jax.Array,
    cfg: TrainConfig,
) -> dict[str, jax.Array]:
    """Validation metrics (no grad) — reference train.py's val summaries."""
    _, metrics = reconstruction_loss(dec_params, enc_params, batch, cfg)
    return metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState,
    enc_params: Any,
    batch: jax.Array,
    cfg: TrainConfig,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One fused forward+backward+Adam step (the hot loop, one program)."""
    (_, metrics), grads = jax.value_and_grad(
        reconstruction_loss, has_aux=True
    )(state.params, enc_params, batch, cfg)
    grads = clip_grads(grads, cfg)
    updates, opt_state = make_optimizer(cfg).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return (
        state.replace(params=params, opt_state=opt_state, step=state.step + 1),
        metrics,
    )


def make_sharded_train_step(mesh: Mesh, cfg: TrainConfig, axis_name: str = "data"):
    """Data-parallel train step over ``mesh`` (new scope vs reference).

    Batch shards over ``data``; state + encoder replicate; jit's
    sharding propagation inserts the gradient all-reduce over ICI.
    Returns ``fn(state, enc_params, batch) -> (state, metrics)``.
    """
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis_name))

    def step(state, enc_params, batch):
        (_, metrics), grads = jax.value_and_grad(
            reconstruction_loss, has_aux=True
        )(state.params, enc_params, batch, cfg)
        grads = clip_grads(grads, cfg)
        updates, opt_state = make_optimizer(cfg).update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(rep, rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
