"""Feature-transform and conv kernels (reference WCT-TF ops.py rebuilt TPU-native).

Submodules (several define a function named like the module, so the
package exposes MODULES, not bare functions — use ``ops.wct.wct``):

- ``wct``        — whitening–coloring transform + style-stat cache
- ``adain``      — adaptive instance normalization
- ``style_swap`` — patch nearest-neighbor swap in whitened space
- ``sqrtm``      — Newton–Schulz matrix ±sqrt (XLA + Pallas)
- ``convs``      — reflect-pad conv, maxpool, NN-upsample primitives
- ``reductions`` — batch-bitwise-stable sum reductions (MXU form)
"""

from wct_tpu.ops import (  # noqa: F401
    adain,
    convs,
    reductions,
    sqrtm,
    style_swap,
    wct,
)

__all__ = ["adain", "convs", "reductions", "sqrtm", "style_swap", "wct"]
