"""Feature-transform and conv kernels (reference WCT-TF ops.py rebuilt TPU-native).

Submodules (several define a function named like the module, so the
package exposes MODULES, not bare functions — use ``ops.wct.wct``):

- ``wct``        — whitening–coloring transform + style-stat cache
- ``adain``      — adaptive instance normalization
- ``style_swap`` — patch nearest-neighbor swap in whitened space
- ``sqrtm``      — Newton–Schulz matrix ±sqrt (XLA + Pallas)
- ``convs``      — reflect-pad conv, maxpool, NN-upsample primitives
"""

from wct_tpu.ops import adain, convs, sqrtm, style_swap, wct  # noqa: F401

__all__ = ["adain", "convs", "sqrtm", "style_swap", "wct"]
