"""wct_tpu — TPU-native universal style transfer framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
eridgd/WCT-TF (Universal Style Transfer via Feature Transforms,
Li et al. 2017, arXiv:1705.08086):

- frozen VGG-19 encoder + five per-level decoders as pure-function
  XLA convnets (``wct_tpu.models``),
- the whitening–coloring transform as an on-device kernel — symmetric
  eigendecomposition via ``jax.lax.linalg.eigh`` or a Newton–Schulz
  matrix-sqrt iteration (pure-XLA and Pallas variants) — with no host
  SVD fallback (``wct_tpu.ops``),
- the relu5_1→relu1_1 cascade, alpha blending, AdaIN, style-swap,
  multi-style interpolation fused into one jit graph
  (``wct_tpu.models.cascade``),
- batched / streaming inference with persistent style-statistics
  caching and data-parallel sharding over a TPU mesh
  (``wct_tpu.parallel``),
- an optax decoder trainer (``wct_tpu.train``),
- host-side image IO and color control (``wct_tpu.utils``).

This is a new TPU-first design, not a port; reference behavior it
reproduces is cited per-function as ``WCT-TF file.py:~line`` (see
SURVEY.md for the provenance convention).
"""

__version__ = "0.1.0"

from wct_tpu import ops, models, parallel, utils  # noqa: F401
