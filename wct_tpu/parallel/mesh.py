"""Device mesh + sharding for batched stylization and training.

Entirely new scope relative to the reference (WCT-TF is single-process
single-GPU, batch 1 — SURVEY.md §2 "Parallelism strategies: none").
The TPU-native design (SURVEY.md §5, distributed-communication row):

- a 1-D ``data`` mesh over all chips; batches shard over it, params
  replicate; XLA inserts the (nil, at inference) collectives over ICI;
- per-image Gram/eigh work is already ``vmap``-ed, so data sharding
  splits it perfectly — no cross-device reductions at inference;
- training does the same with a ``psum`` of gradients (via
  ``NamedSharding``-annotated jit — XLA emits the all-reduce over ICI).

No NCCL/MPI analogue exists or is needed: ``jax.sharding`` + jit IS the
communication backend on TPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wct_tpu.models import cascade as cascade_lib


def create_mesh(
    n_devices: int | None = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard a [B, ...] array's leading dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, style cache, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(x: jax.Array, mesh: Mesh, axis_name: str = "data") -> jax.Array:
    """Place a host batch onto the mesh, sharded over its leading dim."""
    return jax.device_put(x, batch_sharding(mesh, axis_name))


def shard_spatial(x: jax.Array, mesh: Mesh, axis_name: str = "data") -> jax.Array:
    """Place images onto the mesh sharded over HEIGHT (dim 1) — the
    input placement ``stylize_spatial`` expects."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))


def stylize_sharded(
    params: dict,
    content: jax.Array,
    style_cache: cascade_lib.StyleCache,
    alpha,
    cfg: cascade_lib.CascadeConfig,
    mesh: Mesh,
    axis_name: str = "data",
) -> jax.Array:
    """Data-parallel cascade over the mesh (BASELINE config 4).

    Batch shards over ``data``; params + style cache replicate. The
    cascade has no cross-image math, so XLA compiles this to fully
    independent per-shard programs — linear scaling over ICI-connected
    chips without any code change to the cascade itself.

    When the batch divides the mesh, the cascade runs under
    ``shard_map`` — per-device locality by CONSTRUCTION, so the program
    provably contains zero collectives (GSPMD's reshape partitioner
    cannot prove pack2's image-pair reshape local and would insert
    collective-permute/all-to-all; shard_map sidesteps the inference
    entirely, and pack2's ``b % 2`` eligibility gate then evaluates on
    the device-LOCAL batch, which is exactly the right semantics).
    Non-dividing batches fall back to GSPMD with pack2 off.
    """
    fn = _sharded_stylize_fn(cfg, mesh, axis_name, spatial=False)
    return fn(params, content, style_cache, jnp.asarray(alpha, jnp.float32))


@lru_cache(maxsize=64)
def _sharded_stylize_fn(
    cfg: cascade_lib.CascadeConfig, mesh: Mesh, axis_name: str, spatial: bool
):
    """Cached jit wrapper per (cfg, mesh, axis, mode).

    Building a fresh ``jax.jit(partial(...))`` per call would bypass
    jit's trace cache and retrace/recompile the whole cascade every
    invocation (~90 s on TPU).
    """
    rep = replicated(mesh)
    data = (
        NamedSharding(mesh, P(None, axis_name))
        if spatial
        else batch_sharding(mesh, axis_name)
    )
    if cfg.fuse_junction:
        # GSPMD cannot partition a pallas_call; the fused-junction
        # kernels are a single-device optimization. Sharded paths run
        # the pure-XLA cascade (same math).
        import dataclasses

        cfg = dataclasses.replace(cfg, fuse_junction=False)
    if spatial:
        return jax.jit(
            partial(cascade_lib.stylize_fn, cfg=cfg),
            in_shardings=(rep, data, rep, rep),
            out_shardings=data,
        )

    # DP: shard_map when the batch divides the mesh — device-local
    # programs by construction (provably collective-free, and pack2's
    # local b%2 gate sees the per-device batch). GSPMD fallback (pack2
    # off: its pair reshape defeats the reshape partitioner) otherwise.
    import dataclasses

    n_dev = mesh.shape[axis_name]
    cfg_nopack = dataclasses.replace(cfg, pack2_junction=False)
    local_fn = partial(cascade_lib.stylize_fn, cfg=cfg)
    gspmd_fn = partial(cascade_lib.stylize_fn, cfg=cfg_nopack)

    def dp_fn(params, content, style_cache, alpha):
        if content.shape[0] % n_dev == 0:
            return jax.shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(P(), P(axis_name), P(), P()),
                out_specs=P(axis_name),
                check_vma=False,
            )(params, content, style_cache, alpha)
        return gspmd_fn(params, content, style_cache, alpha)

    return jax.jit(
        dp_fn, in_shardings=(rep, data, rep, rep), out_shardings=data
    )


def stylize_spatial(
    params: dict,
    content: jax.Array,
    style_cache: cascade_lib.StyleCache,
    alpha,
    cfg: cascade_lib.CascadeConfig,
    mesh: Mesh,
    axis_name: str = "sp",
) -> jax.Array:
    """Spatially-sharded cascade: image HEIGHT splits over the mesh.

    The context/sequence-parallel analogue for a convnet (SURVEY.md §5,
    long-context row): for images too large for one chip's HBM, shard
    the H dimension; XLA's SPMD partitioner inserts halo exchanges for
    every reflect-pad conv and pool (fp-exact vs replicated for the
    conv stack), and all-reduces the per-image Gram statistics over
    ICI.

    Caveat (documented, inherent to the reference algorithm): the Gram
    all-reduce changes float32 summation order, and the WCT's hard
    eigenvalue truncation at ``trunc`` is discontinuous — a
    rank-deficient covariance whose null eigenvalues sit near the
    threshold can flip modes vs the single-device result. Outputs are
    valid stylizations and deterministic for a fixed mesh, but not
    bitwise-comparable to the unsharded path; use DP
    (``stylize_sharded``) when bitwise reproducibility matters.
    """
    fn = _sharded_stylize_fn(cfg, mesh, axis_name, spatial=True)
    return fn(params, content, style_cache, jnp.asarray(alpha, jnp.float32))
