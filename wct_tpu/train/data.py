"""Host-side training data pipeline with double-buffered device prefetch.

The reference feeds every batch synchronously through ``feed_dict``
(train.py:~120 — a known inefficiency, SURVEY.md §3.2). Here decode +
random-crop runs in host worker threads while the previous batch
trains, and batches are ``jax.device_put`` ahead of use so the TPU
never waits on the host (the double-buffered host→HBM transfer of the
BASELINE north star).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator

import jax
import numpy as np

from wct_tpu.utils import images as img_utils


def batch_generator(
    paths: list[str],
    batch_size: int,
    crop_size: int = 256,
    seed: int = 0,
    loop: bool = True,
) -> Iterator[np.ndarray]:
    """Yield ``[B, crop, crop, 3]`` float32 batches of random crops.

    Reference train.py's generator (get_img_random_crop loop) with
    shuffling per epoch. Corrupt/unreadable files are skipped with a
    warning rather than killing a long run.
    """
    rng = np.random.default_rng(seed)
    if not paths:
        raise ValueError("no training images found")
    while True:
        order = rng.permutation(len(paths))
        batch: list[np.ndarray] = []
        for idx in order:
            try:
                batch.append(
                    img_utils.get_img_random_crop(paths[idx], crop_size, rng)
                )
            except Exception as e:  # noqa: BLE001 — skip bad files
                print(f"[data] skipping {paths[idx]}: {e}")
                continue
            if len(batch) == batch_size:
                yield np.stack(batch)
                batch = []
        if not loop:
            if batch:
                yield np.stack(batch)
            return


def synthetic_batches(
    batch_size: int, crop_size: int = 256, seed: int = 0
) -> Iterator[np.ndarray]:
    """Procedural image batches — tests / smoke runs without a dataset
    (MS-COCO is not shippable with the repo; SURVEY.md §7 blocker)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:crop_size, 0:crop_size].astype(np.float32) / crop_size
    while True:
        freqs = rng.uniform(1, 12, size=(batch_size, 2, 3)).astype(np.float32)
        phases = rng.uniform(0, 6.28, size=(batch_size, 2, 3)).astype(np.float32)
        imgs = 0.5 + 0.25 * (
            np.sin(freqs[:, 0, None, None, :] * 6.28 * yy[None, :, :, None]
                   + phases[:, 0, None, None, :])
            + np.sin(freqs[:, 1, None, None, :] * 6.28 * xx[None, :, :, None]
                     + phases[:, 1, None, None, :])
        )
        yield np.clip(imgs, 0.0, 1.0).astype(np.float32)


class DevicePrefetcher:
    """Overlap host decode + H2D transfer with device compute.

    ``workers`` threads pull numpy batches from ``it`` (the iterator is
    shared under a lock; image decode releases the GIL, so decode
    genuinely parallelizes) and ``device_put`` them (optionally with a
    sharding) into a bounded queue; the train loop pops ready-on-device
    batches IN ORDER — each worker reserves a sequence ticket under the
    iterator lock and a reorder buffer releases batches sequentially.
    ``depth=2`` is classic double buffering; raise ``workers`` when
    host decode can't feed the device (e.g. JPEG decode at 65 fps).
    """

    _END = object()

    def __init__(
        self,
        it: Iterator[np.ndarray],
        depth: int = 2,
        sharding=None,
        workers: int = 1,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, workers))
        self._sharding = sharding
        self._it = it
        self._it_lock = threading.Lock()
        self._seq = 0
        self._error: BaseException | None = None
        self._reorder: dict[int, object] = {}
        self._next_out = 0
        self._ended = 0
        self._workers = max(1, workers)
        self._threads = [
            threading.Thread(target=self._run, daemon=True)
            for _ in range(self._workers)
        ]
        for t in self._threads:
            t.start()

    def _run(self):
        while True:
            try:
                with self._it_lock:
                    batch = next(self._it)
                    ticket = self._seq
                    self._seq += 1
            except StopIteration:
                self._q.put((None, self._END))
                return
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                self._error = e
                self._q.put((None, self._END))
                return
            try:
                self._q.put((ticket, jax.device_put(batch, self._sharding)))
            except BaseException as e:  # noqa: BLE001
                self._error = e
                self._q.put((None, self._END))
                return

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if self._next_out in self._reorder:
                item = self._reorder.pop(self._next_out)
                self._next_out += 1
                return item
            ticket, item = self._q.get()
            if item is self._END:
                self._ended += 1
                if self._error is not None:
                    # Producer failures must fail the consumer, not
                    # look like clean end-of-data (a training job whose
                    # dataset vanished must NOT exit 0 at step 0).
                    raise self._error
                if self._ended == self._workers and not self._reorder:
                    raise StopIteration
                continue
            self._reorder[ticket] = item
