"""Optional TensorBoard scalar/image writer (gated on bundled TF).

The reference logs training scalars and reconstruction images to
TensorBoard (train.py summaries, SURVEY.md C12/§5 metrics row). The
primary log here is dependency-free JSONL; this writer adds
TensorBoard-compatible event files when TensorFlow is importable, and
degrades to a no-op otherwise — TF is never a runtime requirement.
"""

from __future__ import annotations

import os


class SummaryWriter:
    """tf.summary wrapper; silently a no-op when TF is unavailable."""

    def __init__(self, log_dir: str | os.PathLike):
        self._writer = None
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tf = tf
            self._writer = tf.summary.create_file_writer(str(log_dir))
        except Exception:  # noqa: BLE001 — observability must never be fatal
            self._tf = None

    @property
    def active(self) -> bool:
        return self._writer is not None

    def scalars(self, step: int, values: dict[str, float]) -> None:
        if self._writer is None:
            return
        with self._writer.as_default(step=step):
            for name, val in values.items():
                self._tf.summary.scalar(name, val)
        self._writer.flush()

    def images(self, step: int, name: str, imgs) -> None:
        """imgs: [N, H, W, 3] float [0,1]."""
        if self._writer is None:
            return
        with self._writer.as_default(step=step):
            self._tf.summary.image(name, imgs, max_outputs=4)
        self._writer.flush()
