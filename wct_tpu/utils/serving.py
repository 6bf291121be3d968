"""Shape-bucketed serving: arbitrary image sizes, bounded compile count.

XLA compiles one program per input shape, and a full-cascade compile is
~90 s on TPU — unacceptable per novel size in production (SURVEY.md
§4.5 "bucketed-shape serving path"). ``BucketedStylizer`` reflect-pads
each image's H and W up to the next multiple of ``granularity`` OUTSIDE
the jit boundary, stylizes at the bucketed shape (one compiled program
per bucket, reused forever), and crops the output back — every input
size is served exactly, with at most (maxH/granularity)·(maxW/granularity)
programs ever compiled.

The padded border participates in the content Gram like any reflected
border pixel does in the reference's reflect-padded convs; its effect
on the global statistics is proportional to the padded fraction
(< granularity/size).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:  # runtime import is lazy: utils must stay light and
    from wct_tpu.models import cascade  # models→utils imports must not cycle


def bucket_shape(h: int, w: int, granularity: int = 128) -> tuple[int, int]:
    """Smallest (H, W) multiple of ``granularity`` covering (h, w)."""
    up = lambda v: -(-v // granularity) * granularity
    return up(h), up(w)


def pad_to_bucket(
    img: np.ndarray, granularity: int = 128
) -> tuple[np.ndarray, tuple[int, int]]:
    """Reflect-pad ``[H, W, 3]`` to its bucket; returns (padded, (h, w))."""
    h, w = img.shape[:2]
    bh, bw = bucket_shape(h, w, granularity)
    if (bh, bw) == (h, w):
        return img, (h, w)
    # np.pad reflect needs pad < dim; tiny images fall back to edge.
    mode = "reflect" if (bh - h < h and bw - w < w) else "edge"
    return np.pad(img, ((0, bh - h), (0, bw - w), (0, 0)), mode=mode), (h, w)


class BucketedStylizer:
    """Serve arbitrary-size single images through bucketed compiled shapes."""

    def __init__(
        self,
        params: dict,
        cfg: cascade.CascadeConfig,
        granularity: int = 128,
    ):
        self.params = params
        self.cfg = cfg
        self.granularity = granularity
        self._cache: "cascade.StyleCache | None" = None

    def set_style(self, style_img: np.ndarray) -> None:
        from wct_tpu.models import cascade

        self._cache = cascade.precompute_style(
            self.params["encoder"], jnp.asarray(style_img, jnp.float32), self.cfg
        )

    def stylize(self, img: np.ndarray, alpha: float = 1.0) -> np.ndarray:
        """Stylize one [H, W, 3] image of ANY size; output size == input."""
        if self._cache is None:
            raise RuntimeError("no style set")
        from wct_tpu.models import cascade

        padded, (h, w) = pad_to_bucket(
            np.asarray(img, np.float32), self.granularity
        )
        out = cascade.stylize(
            self.params, jnp.asarray(padded)[None], self._cache, alpha, self.cfg
        )
        return np.asarray(out[0, :h, :w, :], dtype=np.float32)
