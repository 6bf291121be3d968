"""Streaming video stylization: threaded capture + persistent style cache.

Rebuilds the reference webcam.py machinery (SURVEY.md C13):

- ``VideoSource`` — the reference's ``WebcamVideoStream``: a daemon
  capture thread with a latest-frame mailbox, decoupling camera/file
  IO from compute (the reference's only concurrency, kept).
- ``StreamStylizer`` — per-frame engine with an EXPLICIT persistent
  style-statistics cache (BASELINE config 5): styles are encoded once
  on style switch, every frame reuses the cached coloring kernels, and
  frames ride one compiled graph (fixed shape). Also exposes live
  alpha and two-style interpolation sweeps like the reference's
  ``--interpolate``.

cv2 is imported lazily and only needed for camera/video sources; the
engine itself is array-in/array-out and is exercised by CPU tests.
"""

from __future__ import annotations

import threading

import jax.numpy as jnp
import numpy as np

from wct_tpu.models import cascade
from wct_tpu.utils import colors as color_utils
from wct_tpu.utils import images as img_utils


def _require_cv2():
    try:
        import cv2  # noqa: PLC0415

        return cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "OpenCV (cv2) is required for camera/video capture"
        ) from e


class VideoSource:
    """Threaded frame grabber with a latest-frame mailbox.

    Reference ``WebcamVideoStream`` (webcam.py:~10): the capture thread
    always overwrites the newest frame so compute never processes a
    backlog (drop-frames-not-latency policy).
    """

    def __init__(self, src: int | str = 0, width: int = 0, height: int = 0):
        cv2 = _require_cv2()
        self._cap = cv2.VideoCapture(src)
        if width:
            self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        if height:
            self._cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        if not self._cap.isOpened():
            raise RuntimeError(f"cannot open video source {src!r}")
        self._lock = threading.Lock()
        self._frame: np.ndarray | None = None
        self._stopped = False
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self) -> "VideoSource":
        self._thread.start()
        return self

    def _loop(self):
        while not self._stopped:
            ok, frame = self._cap.read()
            if not ok:
                self._stopped = True
                break
            with self._lock:
                self._frame = frame

    def read(self) -> np.ndarray | None:
        """Latest BGR uint8 frame, or None if the source ended."""
        with self._lock:
            return None if self._frame is None and self._stopped else self._frame

    @property
    def stopped(self) -> bool:
        return self._stopped

    def stop(self):
        # Join the capture thread BEFORE releasing: release() while a
        # read() is in flight is not thread-safe in OpenCV.
        self._stopped = True
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)
        self._cap.release()


class StreamStylizer:
    """Fixed-shape per-frame stylization engine with style-stat caching."""

    def __init__(
        self,
        params: dict,
        cfg: cascade.CascadeConfig,
        height: int,
        width: int,
        keep_colors: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.height = height
        self.width = width
        self.keep_colors = keep_colors
        self.alpha = 1.0
        self._cache: cascade.StyleCache | None = None
        self._caches: list[cascade.StyleCache] = []

    # -- style management (encode ONCE per style switch) --
    def set_style(self, style_img: np.ndarray) -> None:
        self._cache = cascade.precompute_style(
            self.params["encoder"], jnp.asarray(style_img, jnp.float32), self.cfg
        )
        self._caches = []

    def set_styles_interpolated(
        self, style_imgs: list[np.ndarray], weights: np.ndarray
    ) -> None:
        """Cache K styles; blend with ``weights`` (reference --interpolate)."""
        self._caches = [
            cascade.precompute_style(
                self.params["encoder"], jnp.asarray(s, jnp.float32), self.cfg
            )
            for s in style_imgs
        ]
        self.set_interp_weights(weights)

    def set_interp_weights(self, weights: np.ndarray) -> None:
        if not self._caches:
            raise RuntimeError("call set_styles_interpolated first")
        self._cache = cascade.interpolate_style_caches(
            self._caches, jnp.asarray(weights, jnp.float32), self.cfg
        )

    # -- batched offline path (video files) --
    def process_batch(
        self, frames_rgb: list[np.ndarray], pad_to: int = 0
    ) -> list[np.ndarray]:
        """Stylize N frames in one dispatch (offline video throughput).

        ``pad_to`` pads a short trailing batch up to the steady-state
        size (repeating the last frame; extra outputs dropped) so it
        reuses the full batch's compiled graph.
        """
        if self._cache is None:
            raise RuntimeError("no style set")
        sized = [
            f if f.shape[:2] == (self.height, self.width)
            else img_utils.resize_exact(f, self.height, self.width)
            for f in frames_rgb
        ]
        n = len(sized)
        if pad_to > n:
            sized = sized + [sized[-1]] * (pad_to - n)
        out = cascade.stylize(
            self.params,
            jnp.asarray(np.stack(sized), jnp.float32),
            self._cache,
            self.alpha,
            self.cfg,
        )
        outs = [np.asarray(o, dtype=np.float32) for o in out[:n]]
        sized = sized[:n]
        if self.keep_colors:
            outs = [
                color_utils.preserve_colors_np(f, o) for f, o in zip(sized, outs)
            ]
        return outs

    # -- per-frame hot path --
    def process(self, frame_rgb: np.ndarray) -> np.ndarray:
        """Stylize one RGB float [0,1] frame (any size → fixed size)."""
        if self._cache is None:
            raise RuntimeError("no style set")
        if frame_rgb.shape[:2] != (self.height, self.width):
            frame_rgb = img_utils.resize_exact(frame_rgb, self.height, self.width)
        out = cascade.stylize(
            self.params,
            jnp.asarray(frame_rgb, jnp.float32)[None],
            self._cache,
            self.alpha,
            self.cfg,
        )
        stylized = np.asarray(out[0], dtype=np.float32)
        if self.keep_colors:
            stylized = color_utils.preserve_colors_np(frame_rgb, stylized)
        return stylized
