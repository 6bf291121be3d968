"""Shared CLI plumbing: flags → CascadeConfig, weight loading.

The reference duplicates its flag lists between stylize.py and
webcam.py (SURVEY.md §5, config row flags this as a defect); here both
front-ends parse through one flag builder and one loader.
"""

from __future__ import annotations

import argparse
import contextlib
import os

import jax
import jax.numpy as jnp

from wct_tpu.models import cascade
from wct_tpu.train import checkpoint


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — the full cascade takes ~90 s
    to compile on TPU; cached re-runs start instantly. Never fatal."""
    cache_dir = path or os.environ.get(
        "WCT_COMPILE_CACHE", os.path.expanduser("~/.cache/wct_tpu_xla")
    )
    with contextlib.suppress(Exception):
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def add_model_flags(p: argparse.ArgumentParser) -> None:
    """Flags shared by every front-end (reference stylize.py:~15 flags)."""
    p.add_argument(
        "--weights",
        default=None,
        help="npz bundle with {'encoder':..., 'decoders': {relu_target: ...}} "
        "(see tools/convert_t7.py / train CLI). Omit for random weights "
        "(smoke tests).",
    )
    p.add_argument(
        "--checkpoints",
        nargs="+",
        default=None,
        help="per-level decoder npz files, one per --relu-targets entry in "
        "the same order (reference stylize.py --checkpoints, which took "
        "one TF checkpoint dir per level — convert those with "
        "tools/convert_tf_ckpt first). Alternative to a --weights bundle; "
        "needs --vgg-path for the encoder.",
    )
    p.add_argument(
        "--vgg-path",
        default=None,
        help="encoder weights npz (reference --vgg-path took the t7; "
        "convert it once with tools/convert_t7). Used with --checkpoints.",
    )
    p.add_argument(
        "--relu-targets",
        nargs="+",
        default=list(cascade.DEFAULT_TARGETS),
        help="cascade order, deepest first (reference --relu-targets)",
    )
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--passes", type=int, default=1)
    p.add_argument("--adain", action="store_true", help="AdaIN instead of WCT")
    p.add_argument("--swap5", action="store_true", help="style-swap at relu5_1")
    p.add_argument("--ss-alpha", type=float, default=0.6)
    p.add_argument("--ss-patch-size", type=int, default=3)
    p.add_argument("--ss-stride", type=int, default=1)
    p.add_argument(
        "--method",
        choices=[
            "eigh", "newton_schulz", "newton_schulz_fast",
            "newton_schulz_pallas", "auto",
        ],
        default="eigh",
        help="matrix-sqrt path for WCT ('auto' = eigh for small Grams, "
        "Newton-Schulz for 128+ channels; newton_schulz_fast = "
        "3-pass-bf16 iteration matmuls, rel err 5e-5 — the throughput "
        "choice)",
    )
    p.add_argument(
        "--dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help="conv compute dtype (bfloat16 = throughput mode)",
    )
    p.add_argument(
        "--conv-precision",
        choices=["highest", "high"],
        default="highest",
        help="MXU pass count for float32 convs: highest = 6-pass bf16 "
        "(true f32), high = 3-pass (~1e-6 rel err, ~2x conv speed). "
        "Ignored for --dtype bfloat16",
    )
    p.add_argument(
        "--soft-trunc",
        action="store_true",
        help="continuous eigenvalue filter instead of the hard 1e-5 "
        "truncation (batch-stable on rank-deficient features; default "
        "is exact reference behavior)",
    )
    p.add_argument(
        "--rel-trunc",
        type=float,
        default=None,
        metavar="R",
        help="RELATIVE eigenvalue threshold: keep modes with "
        "s > R*s_max instead of the reference's absolute 1e-5. The "
        "cross-solver-REPRODUCIBLE truncation mode: at R=1e-3 the keep "
        "mask is measured bit-identical between f32 eigh and the "
        "float64 oracle (scripts/exp_matched_mask.py) — what "
        "--soft-trunc was hoped to be and measurably is not. Requires "
        "--method eigh; exclusive with --soft-trunc",
    )
    p.add_argument(
        "--wct-groups",
        type=int,
        default=1,
        help="grouped (block-diagonal) WCT: split channels into G "
        "independent groups (1 = exact reference WCT)",
    )
    p.add_argument(
        "--ns-iters",
        default=None,
        help="Newton-Schulz iteration override for the content-side "
        "whitening solve: an int for every level ('10') or per-level "
        "pairs ('relu5_1=12,relu1_1=8'; unlisted levels keep the "
        "default 14). Ignored by eigh",
    )
    p.add_argument(
        "--preset",
        choices=["fidelity", "balanced", "throughput"],
        default=None,
        help="quality/speed preset setting --dtype/--method (an "
        "explicit --fold/--no-fold always wins over the preset): "
        "fidelity = f32 + eigh (reference-exact truncation), "
        "balanced = f32 convs + auto solver (16 fps/chip at 512px), "
        "throughput = bf16 + fast Newton-Schulz + image-pair packed "
        "64-ch convs (78 fps/chip at 512px)",
    )
    p.add_argument(
        "--fold",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="fold the per-image WCT/AdaIN affine into the decoder's "
        "first conv. Wins on CPU-class backends; measured a LOSS on "
        "TPU v5e (XLA lowers batch_group_count convs ~4x slower than "
        "shared-weight convs), so no preset enables it",
    )
    p.add_argument(
        "--compose-conv0",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="fold the encoder's linear 1x1 preprocessing conv0 into "
        "conv1_1 so its full-resolution HLO never runs (identical "
        "math; measured ~5 ms per encoder head at batch-8 1024px). "
        "The throughput preset enables it; --no-compose-conv0 opts "
        "out",
    )
    p.add_argument(
        "--ring-conv",
        action="store_true",
        help="pad-copy-free reflect convs: the bulk of every conv runs "
        "zero-pad SAME (no materialized [H+2, W+2] reflect copy in "
        "HBM) with exact reflect borders spliced in from thin strips. "
        "Same math; targets high resolutions where the pad copy's HBM "
        "traffic dominates (e.g. batch-8 1024px)",
    )


def _parse_ns_iters(spec):
    """'10' → 10; 'relu5_1=12,relu1_1=8' → (('relu5_1', 12), ('relu1_1', 8))."""
    if spec is None or spec == "":
        return None
    s = str(spec)
    if "=" not in s:
        try:
            return int(s)
        except ValueError:
            raise SystemExit(
                f"--ns-iters: expected an int or 'reluN_1=K,...', got {s!r}"
            )
    pairs = []
    for part in s.split(","):
        if "=" not in part:
            raise SystemExit(f"--ns-iters: bad pair {part!r} in {s!r}")
        target, _, val = part.partition("=")
        try:
            pairs.append((target.strip(), int(val)))
        except ValueError:
            raise SystemExit(f"--ns-iters: bad count in {part!r}")
    return tuple(pairs)


# (dtype, method, fold, pack2, compose_conv0)
_PRESETS = {
    "fidelity": ("float32", "eigh", False, False, False),
    "balanced": ("float32", "auto", False, False, False),
    "throughput": ("bfloat16", "newton_schulz_fast", False, True, True),
}


def config_from_args(args: argparse.Namespace) -> cascade.CascadeConfig:
    preset_pack2 = False
    preset_compose0 = False
    if getattr(args, "preset", None):
        (args.dtype, args.method, preset_fold, preset_pack2,
         preset_compose0) = _PRESETS[args.preset]
        if getattr(args, "fold", None) is None:
            args.fold = preset_fold
        # An explicit --fold wins over the preset (per the --preset help
        # text): pack2 and fold rewrite the same decoder-tail segment,
        # so the preset's pack2 yields to the user's fold.
        preset_pack2 = preset_pack2 and not bool(getattr(args, "fold", None))
    # Explicit --compose-conv0/--no-compose-conv0 wins over the preset.
    compose0 = getattr(args, "compose_conv0", None)
    if compose0 is None:
        compose0 = preset_compose0
    return cascade.CascadeConfig(
        relu_targets=tuple(args.relu_targets),
        transform="adain" if args.adain else "wct",
        swap5=args.swap5,
        ss_alpha=args.ss_alpha,
        ss_patch_size=args.ss_patch_size,
        ss_stride=args.ss_stride,
        passes=args.passes,
        method=args.method,
        compute_dtype=args.dtype,
        conv_precision=getattr(args, "conv_precision", "highest"),
        wct_groups=args.wct_groups,
        soft_trunc=args.soft_trunc,
        rel_trunc=getattr(args, "rel_trunc", None),
        ns_iters=_parse_ns_iters(getattr(args, "ns_iters", None)),
        fold_transform=bool(getattr(args, "fold", None)),
        pack2_junction=preset_pack2,
        ring_conv=bool(getattr(args, "ring_conv", False)),
        compose_conv0=compose0,
    )


def load_params(args: argparse.Namespace) -> dict:
    """Load the weight bundle, per-level checkpoints, or random-init."""
    targets = tuple(args.relu_targets)
    ckpts = getattr(args, "checkpoints", None)
    if ckpts:
        # Reference-style per-level loading (stylize.py:~60 restored one
        # Saver checkpoint per --checkpoints dir, paired with
        # --relu-targets by position).
        if args.weights:
            raise SystemExit("--checkpoints and --weights are exclusive")
        if len(ckpts) != len(targets):
            raise SystemExit(
                f"--checkpoints got {len(ckpts)} files for "
                f"{len(targets)} --relu-targets; they pair by position"
            )
        if not getattr(args, "vgg_path", None):
            raise SystemExit("--checkpoints needs --vgg-path for the encoder")
        enc = checkpoint.load_pytree(args.vgg_path)
        decoders = {}
        from wct_tpu.tools.make_bundle import validate_decoder

        for t, path in zip(targets, ckpts):
            tree = checkpoint.load_pytree(path)
            tree = tree["params"] if "params" in tree else tree
            try:
                validate_decoder(tree, t)
            except ValueError as e:
                raise SystemExit(
                    f"--checkpoints {path} is not a {t} decoder: {e}"
                ) from e
            decoders[t] = tree
        return {
            "encoder": enc["encoder"] if "encoder" in enc else enc,
            "decoders": decoders,
        }
    if args.weights:
        params = checkpoint.load_pytree(args.weights)
        missing = [t for t in targets if t not in params.get("decoders", {})]
        if "encoder" not in params or missing:
            raise SystemExit(
                f"weight bundle {args.weights} lacks encoder or decoders "
                f"for {missing}"
            )
        params["decoders"] = {
            t: params["decoders"][t] for t in targets
        }
        return params
    print(
        "[wct_tpu] NOTE: no --weights given — using RANDOM weights "
        "(pipeline smoke test, not a meaningful stylization)"
    )
    return cascade.init_params(jax.random.PRNGKey(0), targets)


def to_device_img(img) -> jax.Array:
    return jnp.asarray(img, jnp.float32)
