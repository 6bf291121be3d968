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
from collections import deque

import jax
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
    """Fixed-shape per-frame stylization engine with style-stat caching.

    Two serving modes:

    - ``process(frame)`` — strict latency: submit, read back, return
      THIS frame's output. Each call pays the full device round trip
      (compute + D2H + the ~27 ms axon-tunnel RTT) serially.
    - ``submit(frame)`` / ``collect()`` (or the ``process_pipelined``
      convenience) — submit-ahead/sync-behind: frame N+1's host prep,
      H2D and compute dispatch are enqueued BEFORE frame N's output is
      read back, so the readback latency (tunnel RTT + D2H) overlaps
      the next frame's device compute. TPU executes in order, so
      correctness is unaffected; the cost is ONE frame of display
      latency (VERDICT r1 item 6; reference webcam.py has no such
      overlap — its sess.run is fully serial).

    ``readback='uint8'`` additionally clips+quantizes ON DEVICE so the
    D2H transfer moves 1/4 of the bytes (the stream front-end converts
    to uint8 for display/encoding anyway, and the quantization is
    bitwise-identical to the host-side ``clip(x,0,1)*255 → uint8``).
    Outputs are still returned as float32 in [0,1].

    ``frame_batch=K`` groups K consecutive frames into ONE dispatch in
    the pipelined path: batch-1 dispatches leave the chip ~2.4× less
    efficient per frame than batched serving (measured r1: 33 fps b1 vs
    78 fps b16 at 512px), and an even K makes the stream eligible for
    ``pack2_junction``'s image-pair lane packing. Costs K−1 extra
    frames of latency on top of the pipeline depth; K=1 keeps the
    reference's strict frame-at-a-time semantics.
    """

    def __init__(
        self,
        params: dict,
        cfg: cascade.CascadeConfig,
        height: int,
        width: int,
        keep_colors: bool = False,
        readback: str = "float32",
        pipeline_depth: int = 1,
        frame_batch: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.height = height
        self.width = width
        self.keep_colors = keep_colors
        self.alpha = 1.0
        self._cache: cascade.StyleCache | None = None
        self._caches: list[cascade.StyleCache] = []
        if readback not in ("float32", "uint8"):
            raise ValueError(f"readback must be 'float32'|'uint8', got {readback!r}")
        self._postcast = (
            jax.jit(
                lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            )
            if readback == "uint8"
            else None
        )
        if pipeline_depth < 1:
            raise ValueError(f"pipeline_depth must be >= 1, got {pipeline_depth}")
        self.pipeline_depth = pipeline_depth
        if frame_batch < 1:
            raise ValueError(f"frame_batch must be >= 1, got {frame_batch}")
        self.frame_batch = frame_batch
        # groups of ≤frame_batch frames: (host frames, device batch, n_real)
        self._pending: deque[tuple[list[np.ndarray], jax.Array, int]] = deque()
        self._inbuf: list[np.ndarray] = []  # frames awaiting a full group
        self._outbuf: deque[np.ndarray] = deque()  # materialized, undelivered
        # (alpha, style cache) snapshotted when a group's FIRST frame is
        # submitted, so a live setting change never applies retroactively
        # to frames already buffered (ADVICE r2: dispatch-time binding
        # made --frame-batch 2 interp ramps subsample).
        self._group_settings: tuple[float, cascade.StyleCache | None] | None = None

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
    def _resize(self, frame_rgb: np.ndarray) -> np.ndarray:
        if frame_rgb.shape[:2] != (self.height, self.width):
            frame_rgb = img_utils.resize_exact(frame_rgb, self.height, self.width)
        return frame_rgb

    def _dispatch(
        self,
        batch: np.ndarray,
        alpha: float | None = None,
        cache: cascade.StyleCache | None = None,
    ) -> jax.Array:
        """H2D + compute dispatch (async) for a [K, H, W, 3] batch."""
        cache = cache if cache is not None else self._cache
        if cache is None:
            raise RuntimeError("no style set")
        out = cascade.stylize(
            self.params,
            jnp.asarray(batch, jnp.float32),
            cache,
            self.alpha if alpha is None else alpha,
            self.cfg,
        )
        if self._postcast is not None:
            out = self._postcast(out)
        return out

    def _launch_group(self, frames: list[np.ndarray]) -> None:
        """Dispatch ≤frame_batch resized frames as one padded batch,
        using the settings snapshotted at the group's first submit."""
        n = len(frames)
        alpha, cache = (
            self._group_settings
            if self._group_settings is not None
            else (self.alpha, self._cache)
        )
        self._group_settings = None
        padded = frames + [frames[-1]] * (self.frame_batch - n)
        self._pending.append(
            (frames, self._dispatch(np.stack(padded), alpha, cache), n)
        )

    def _materialize_group(self) -> None:
        """Read back the oldest in-flight group into the output buffer."""
        frames, dev_out, n = self._pending.popleft()
        arr = np.asarray(dev_out)  # ONE D2H for the whole group
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        else:
            arr = arr.astype(np.float32)
        for i in range(n):
            out = arr[i]
            if self.keep_colors:
                out = color_utils.preserve_colors_np(frames[i], out)
            self._outbuf.append(out)

    def process(self, frame_rgb: np.ndarray) -> np.ndarray:
        """Stylize one RGB float [0,1] frame (any size → fixed size).

        Strict-latency mode: blocks for this frame's readback; always a
        single-frame dispatch regardless of ``frame_batch``.
        """
        frame = self._resize(frame_rgb)
        arr = np.asarray(self._dispatch(frame[None])[0])
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        else:
            arr = arr.astype(np.float32)
        if self.keep_colors:
            arr = color_utils.preserve_colors_np(frame, arr)
        return arr

    # -- pipelined mode (submit-ahead / sync-behind) --
    def submit(self, frame_rgb: np.ndarray) -> None:
        """Enqueue a frame's stylization without waiting for its output.

        Frames accumulate until ``frame_batch`` are buffered, then fly
        as one dispatch. Alpha/style/interp settings are snapshotted
        when a group's FIRST frame is submitted and apply to that whole
        group — a live change takes effect from the next group, never
        retroactively.
        """
        if not self._inbuf:
            self._group_settings = (self.alpha, self._cache)
        self._inbuf.append(self._resize(frame_rgb))
        if len(self._inbuf) >= self.frame_batch:
            self._launch_group(self._inbuf)
            self._inbuf = []

    def collect(self, flush: bool = True) -> np.ndarray | None:
        """Read back the OLDEST in-flight frame (None if none pending).

        With ``flush=True`` (default) a partially-filled frame group is
        dispatched first (padded), so draining with ``while (out :=
        eng.collect()) is not None`` loses no frames. Pollers calling
        ``collect()`` BETWEEN submits mid-stream should pass
        ``flush=False`` so polling doesn't silently defeat batching
        with padded dispatches (ADVICE r2).
        """
        if self._outbuf:
            return self._outbuf.popleft()
        if self._inbuf and flush:
            self._launch_group(self._inbuf)
            self._inbuf = []
        if not self._pending:
            return None
        self._materialize_group()
        return self._outbuf.popleft()

    def process_pipelined(self, frame_rgb: np.ndarray) -> np.ndarray | None:
        """Submit this frame; return a PREVIOUS frame's output.

        Returns None while the pipeline primes (the first
        ``pipeline_depth × frame_batch`` frames, plus group-fill gaps);
        call ``collect()`` after the stream ends to drain the in-flight
        tail. Output order is submission order.
        """
        self.submit(frame_rgb)
        if self._outbuf:
            return self._outbuf.popleft()
        if len(self._pending) > self.pipeline_depth:
            self._materialize_group()
            return self._outbuf.popleft()
        return None

    @property
    def n_pending(self) -> int:
        """Frames in flight (dispatched or buffered), not yet delivered."""
        return (
            sum(n for _, _, n in self._pending)
            + len(self._inbuf)
            + len(self._outbuf)
        )
