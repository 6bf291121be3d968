"""Host-side utilities: image IO, crops, color control."""

from wct_tpu.utils.colors import coral_numpy, preserve_colors_np  # noqa: F401
from wct_tpu.utils.images import (  # noqa: F401
    center_crop,
    get_files,
    get_img,
    get_img_random_crop,
    random_crop,
    resize_exact,
    resize_to,
    save_img,
)
from wct_tpu.utils.serving import BucketedStylizer, bucket_shape  # noqa: F401,E402
