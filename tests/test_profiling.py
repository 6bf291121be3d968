"""Observability tests: stage timers, device sync, bench helpers."""

import jax.numpy as jnp
import numpy as np

from wct_tpu.utils import profiling


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    x = jnp.arange(8.0)
    with t.stage("a", sync_on=x):
        _ = x * 2
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0
    rep = t.report()
    assert "a:" in rep and "×2" in rep


def test_device_sync_handles_pytrees_and_none():
    profiling.device_sync(None)
    profiling.device_sync({"x": jnp.ones((2, 2)), "y": None})


def test_trace_noop_on_unsupported(tmp_path):
    # Must never raise even if the backend can't profile.
    with profiling.trace(str(tmp_path)):
        _ = jnp.ones(4).sum()


def test_bench_helpers():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench_configs",
        pathlib.Path(__file__).parent.parent / "bench" / "configs.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    calls = []

    def fn(x):
        calls.append(x.shape)
        return x + 1

    xs = [jnp.ones((2, 4)) for _ in range(3)]
    fps = mod.pipelined_fps(fn, xs, n_rounds=2)
    assert fps > 0
    lat = mod.latency_ms(fn, xs[0], n=2)
    assert lat >= 0
