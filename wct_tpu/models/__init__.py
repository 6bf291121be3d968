"""Model layer: VGG-19 encoder, per-level decoders, stylization cascade."""

from wct_tpu.models import cascade, decoder, vgg  # noqa: F401
from wct_tpu.models.cascade import (  # noqa: F401
    CascadeConfig,
    StyleCache,
    init_params,
    interpolate_style_caches,
    precompute_style,
    stylize,
    stylize_fn,
    stylize_interp,
    stylize_microbatched,
    stylize_pair,
)
