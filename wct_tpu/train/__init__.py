"""Decoder training: optax trainer, host data pipeline, checkpoints."""

from wct_tpu.train.checkpoint import load_pytree, save_pytree  # noqa: F401
from wct_tpu.train.data import (  # noqa: F401
    DevicePrefetcher,
    batch_generator,
    synthetic_batches,
)
from wct_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    eval_step,
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
    reconstruction_loss,
    total_variation,
    train_step,
)
