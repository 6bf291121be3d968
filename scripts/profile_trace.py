"""Op-level timing INSIDE the fused cascade via jax.profiler + xplane.

Captures a device trace of the steady-state headline config and prints
the top ops by total device time, aggregated by fusion/op name. This is
the ground truth the per-stage (separately-jitted) profile can't give:
XLA fuses across level boundaries, so isolated stage times mislead.

Run: python -m scripts.profile_trace [--size 512] [--batch 16]
"""

from __future__ import annotations

import argparse
import collections
import glob
import sys

import jax
import jax.numpy as jnp
import numpy as np

from wct_tpu.cli.common import enable_compile_cache
from wct_tpu.models import cascade
from wct_tpu.utils.profiling import device_sync

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def capture(fn, batches, tmpdir):
    # warm up + compile outside the trace
    out = fn(batches[0])
    device_sync(out)
    with jax.profiler.trace(tmpdir):
        outs = [fn(b) for b in batches]
        device_sync(outs[-1])


def parse_xplane(tmpdir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(tmpdir + "/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tmpdir}"
    totals = collections.Counter()  # name -> ps
    for path in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(path, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # ONLY the per-op line: module/TraceMe lines span whole
                # executions and would double-count device time.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    totals[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps
        # also dump plane/line names once for debugging
    return totals


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--pack2", action="store_true",
                   help="profile with pack2_junction (the headline "
                        "config's third ingredient)")
    p.add_argument("--dump-lines", action="store_true")
    args = p.parse_args()

    enable_compile_cache()
    log(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    params = cascade.init_params(jax.random.PRNGKey(0))
    cfg = cascade.CascadeConfig(
        compute_dtype="bfloat16", method="newton_schulz_fast",
        pack2_junction=args.pack2,
    )
    style = jnp.asarray(rng.random((args.size, args.size, 3), np.float32))
    cache = cascade.precompute_style(params["encoder"], style, cfg)
    alpha = jnp.float32(0.6)
    batches = [
        jnp.asarray(
            rng.random((args.batch, args.size, args.size, 3), np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(4)
    ]

    fn = lambda c: cascade.stylize(params, c, cache, alpha, cfg)
    tmpdir = "/tmp/wct_trace"
    capture(fn, batches, tmpdir)

    if args.dump_lines:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        for path in glob.glob(tmpdir + "/**/*.xplane.pb", recursive=True):
            xs = xplane_pb2.XSpace()
            xs.ParseFromString(open(path, "rb").read())
            for plane in xs.planes:
                log(f"plane: {plane.name}")
                for line in plane.lines:
                    log(f"  line: {line.name} ({len(line.events)} events)")
        return

    totals = parse_xplane(tmpdir)
    grand = sum(totals.values())
    log(f"\ntotal device op time: {grand/1e12*1e3:.1f} ms over 4 batches")
    for name, ps in totals.most_common(args.top):
        log(f"{ps/1e12*1e3/4:9.3f} ms/batch  {100*ps/max(grand,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
