"""Device-mesh parallelism: sharded batched inference and training."""

from wct_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    stylize_sharded,
    stylize_spatial,
)
