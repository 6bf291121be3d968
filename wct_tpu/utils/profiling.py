"""Observability: synced stage timers + optional device profiler traces.

The reference's tracing story is ``time.time()`` around ``sess.run``
(SURVEY.md §5). Here:

- ``device_sync`` — a sync that actually works through the axon TPU
  tunnel (``block_until_ready`` is a no-op there): reads ONE element.
- ``StageTimer`` — named wall-clock stages with proper device sync,
  for per-stage breakdowns (host decode / H2D / compiled step / D2H).
- ``trace`` — context manager around ``jax.profiler`` for perfetto
  traces when the backend supports it (gated, never fatal).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


def device_sync(out=None) -> None:
    """Force real completion of all enqueued work up to ``out``.

    TPU programs execute in order, so one element of the most recent
    output being readable implies everything before it finished.
    """
    if out is not None:
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
        if leaves:
            _ = np.asarray(leaves[0].ravel()[0])


def timeit_min(fn, *args, iters: int = 10, repeats: int = 3) -> float:
    """min-of-``repeats`` mean-of-``iters`` wall time of ``fn(*args)``, ms.

    The single measurement protocol for every perf experiment
    (scripts/exp_*.py) so numbers are comparable across scripts: warm
    up once, then time ``iters`` enqueues ending in ONE device_sync
    (tunnel RTT amortized), keep the best of ``repeats`` runs (kicks
    out tunnel hiccups).
    """
    out = fn(*args)
    device_sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        device_sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


class StageTimer:
    """Accumulating named stage timer with device-synced boundaries."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        """Time a block; ``sync_on`` is a ZERO-ARG CALLABLE evaluated at
        block exit returning the value to device-sync on — it must be a
        callable because the output to sync on is produced INSIDE the
        block::

            out = {}
            with t.stage("step", sync_on=lambda: out["v"]):
                out["v"] = compiled_step(x)

        Passing a plain value would sync on the PREVIOUS iteration's
        output and misattribute all device time to a later stage.
        """
        t0 = time.perf_counter()
        try:
            yield
        finally:
            device_sync(sync_on() if callable(sync_on) else sync_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Call ``fn``, device-sync its result, record the stage time."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        device_sync(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name}: {total * 1000:.1f} ms total, "
                f"{total / n * 1000:.2f} ms/call ×{n}"
            )
        return "\n".join(lines)


def sync_one_element(out) -> None:
    """Force completion via a SINGLE-element device read.

    On the axon TPU tunnel ``block_until_ready`` is a no-op; reading
    one element requires the producing program — and everything
    enqueued before it (TPU executes in order) — to have finished.
    The canonical sync for all benchmarking (bench.py, bench/configs.py).
    """
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
    if leaves:
        _ = float(leaves[0].ravel()[0])


def latency_seconds(fn, arg, n: int = 5) -> float:
    """Median per-call latency with per-call sync (includes tunnel RTT)."""
    sync_one_element(fn(arg))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync_one_element(fn(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def pipelined_fps(fn, inputs, n_rounds: int = 3) -> float:
    """Frames/sec: enqueue all inputs, sync once on the last output."""
    sync_one_element(fn(inputs[0]))
    frames = sum(x.shape[0] for x in inputs)
    rates = []
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        out = None
        for x in inputs:
            out = fn(x)
        sync_one_element(out)
        rates.append(frames / (time.perf_counter() - t0))
    return float(np.median(rates))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace if the backend supports it; no-op otherwise."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # noqa: BLE001 — profiling must never kill a run
        print(f"[profiling] trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            with contextlib.suppress(Exception):
                jax.profiler.stop_trace()
