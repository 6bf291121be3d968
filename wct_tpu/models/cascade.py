"""The multi-level stylization cascade, fused into one jit graph.

Rebuilds the reference's test-mode ``WCTModel`` (model.py:~145–250,
reconstructed — SURVEY.md C7): content flows relu5_1 → … → relu1_1;
each level encodes the running image, applies the feature transform
(WCT / AdaIN / style-swap at relu5_1) at ``alpha``, and decodes.
TPU-first differences:

- ONE ``jax.jit`` spans all five levels, every conv, and every
  eigendecomposition — zero host round-trips per frame (the
  BASELINE.json north star; the reference could bounce to host for
  every ``tf.svd``).
- Style statistics are a first-class cacheable pytree
  (``StyleCache``): computed once per style via a single encoder sweep
  and reused for every frame/batch (BASELINE config 5), and linearly
  interpolable for multi-style blending (config 3).
- ``alpha``/interpolation weights are traced scalars — changing them
  never recompiles.
- Batching: convs are natively batched; the per-image Gram/eigh work
  is ``vmap``-ed and its sums run as canonical MXU contractions
  (ops/reductions.py). For outputs bitwise-independent of the
  SUBMITTED batch size, serve through ``stylize_microbatched`` — XLA
  tiles convs/large contractions per compiled batch shape, so
  different batch-shape programs can differ at the ULP level.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from wct_tpu.models import decoder as dec_lib
from wct_tpu.models import vgg
from wct_tpu.ops import adain as adain_ops
from wct_tpu.ops import style_swap as swap_ops
from wct_tpu.ops import wct as wct_ops

DEFAULT_TARGETS = ("relu5_1", "relu4_1", "relu3_1", "relu2_1", "relu1_1")


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Static (hashable) pipeline configuration → one compiled graph each.

    Mirrors the reference CLI surface (stylize.py flags, SURVEY.md C8):
    ``relu_targets`` (cascade order), ``transform`` ('wct' | 'adain'),
    ``swap5`` (+ patch params) for style-swap at relu5_1, ``passes``,
    ``method`` selects the eigensolver path, ``compute_dtype`` the conv
    precision (bf16 for throughput; Grams/eigh always accumulate f32).
    """

    relu_targets: tuple[str, ...] = DEFAULT_TARGETS
    transform: str = "wct"  # 'wct' | 'adain'
    swap5: bool = False
    ss_alpha: float = 0.6
    ss_patch_size: int = 3
    ss_stride: int = 1
    passes: int = 1
    method: wct_ops.Method = "eigh"
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # MXU pass count for float32 convs: 'highest' = 6-pass bf16 (true
    # f32 accuracy, the fidelity default), 'high' = 3-pass (~1e-6
    # relative error, ~2× the conv throughput). Irrelevant when
    # compute_dtype='bfloat16' (native single-pass MXU either way).
    conv_precision: str = "highest"  # 'highest' | 'high'
    # The reference clips to [0,1] only before SAVING (stylize.py:~150);
    # mid-cascade the decoded image flows unclipped into the next
    # level's encoder. False = reference semantics (final clip only);
    # True clamps between levels (can stabilize untrained weights).
    clip_between_levels: bool = False
    # Continuous eigenvalue filter instead of the reference's hard 1e-5
    # truncation: immune to the knife-edge mode flips that fp-level
    # input noise (e.g. batch-shape-dependent XLA conv fusion) causes on
    # rank-deficient Grams. False = exact reference semantics.
    soft_trunc: bool = False
    # RELATIVE eigenvalue threshold (keep s > rel_trunc·s_max) instead
    # of the reference's absolute 1e-5 — the cross-solver-REPRODUCIBLE
    # truncation mode. Measured (scripts/exp_matched_mask.py, DESIGN
    # §2b): at 1e-3 the keep mask is BIT-IDENTICAL between f32 eigh and
    # the float64 oracle with no forcing (relvalue ≡ matched_rel,
    # composed-cascade median 1.46e-2 = pure fp tolerance), because the
    # cut lands in a well-separated part of the spectrum instead of
    # inside the near-null f32 noise cloud — the property soft_trunc
    # was hoped to have and measurably does not (median 0.196,
    # unchanged from hard). eigh-only (it is a spectrum mask; the
    # Newton–Schulz paths raise). None = reference 1e-5 behavior.
    rel_trunc: float | None = None
    # Newton–Schulz iteration count override for the CONTENT-side
    # whitening solve (the per-frame hot path; style-side stats keep
    # the convergence-safe default since they run once per style).
    # None = sqrtm.DEFAULT_ITERS (14, tuned for C=512 at 512px).
    # An int applies to every level; a tuple of ("reluN_1", iters)
    # pairs overrides per level (unlisted levels keep the default) —
    # NS needs ~log(κ) iterations, so shallow levels' smaller, better-
    # conditioned covariances converge in fewer. Ignored by eigh.
    ns_iters: int | tuple[tuple[str, int], ...] | None = None
    # Grouped (block-diagonal) WCT: channels split into wct_groups
    # independent groups per level (AdaWCT/PhotoWCT²-style). 1 = exact
    # reference behavior; >1 trades coupling across channel groups for
    # G²-cheaper decompositions. swap5's whitened space stays ungrouped.
    wct_groups: int = 1
    # Fold the per-image WCT/AdaIN affine into the decoder's first conv
    # (decoder.py: decode_folded) instead of materializing the
    # transformed feature map: deletes an [N, C] read+write round trip
    # and its layout copies per level (~14 ms/batch-16 at relu1_1,
    # 512px — the biggest single WCT-stage cost). Mathematically
    # identical (both ops are linear); floating-point rounding differs
    # at the usual matmul-reassociation level, and the folded conv's
    # per-image weights make direct ``stylize`` fp-sensitive to the
    # SUBMITTED batch shape (fixed-shape serving via
    # ``stylize_microbatched`` is immune, as always). Off everywhere by
    # default INCLUDING presets: on TPU v5e the folded conv measured a
    # net LOSS (XLA lowers batch_group_count convs ~4.4x slower than
    # shared-weight convs — DESIGN.md §3), so this is opt-in for
    # backends where grouped convs lower well. swap5's level always
    # takes the unfolded path (the swap is nonlinear).
    fold_transform: bool = False
    # Fuse each level boundary's 512²-tier ops — decoder tail
    # [upsample, conv64→64, conv64→3] + encoder head [conv0∘conv1_1
    # (+ conv1_2, pool1)] — into ONE Pallas kernel
    # (ops/junction_pallas.py): intermediates stay in VMEM instead of
    # six HBM round trips over full-resolution maps. Math is identical
    # (f32-exact boundary semantics, tested); fp rounding differs at
    # matmul-association level. Requires the full-res H and W to be
    # multiples of 16 — other shapes silently take the unfused path.
    # MEASURED SLOWER than the XLA path on v5e (48.8 vs 72.3 fps —
    # Mosaic VMEM data movement; DESIGN.md §3); kept as opt-in
    # infrastructure. Use pack2_junction for the measured XLA win.
    fuse_junction: bool = False
    # Image-pair channel packing for the same junction segments, in
    # pure XLA (ops/pack2.py): [B,H,W,64] pairs → [B/2,H,W,128] with
    # block-diagonal weights — fills all MXU lanes and removes the
    # 64→128 lane padding. Measured 32.7 → 27.6 ms per junction
    # segment at 512px/batch-16 INCLUDING pack/unpack. Identical math
    # (off-diagonal blocks are exact zeros); fp rounding differs like
    # any retiling. Odd batches take the unpacked path.
    pack2_junction: bool = False
    # Resolution-scoped packing (round 4, VERDICT r3 item 3): apply
    # pack2 ONLY to the relu1_1 tail (per-image stats + α-blended
    # transform + final conv on packed pairs) and keep the level
    # junctions unpacked. Motivation: whole-pipeline pack2 measured
    # +8% at 512px but −24% at batch-8 1024px — the junction's
    # block-diagonal 128-ch convs do 2× MACs for the lane fill, a wash
    # at 512px but a loss where maps are 4× bigger, while the tail's
    # win (no 64→128 lane-padding copy on the [N, 64] reshape) scales
    # WITH pixels. Requires pack2_junction=True.
    pack2_tail_only: bool = False
    # The INVERSE scope (round 4): pack the level junctions, keep the
    # relu1_1 tail unpacked. Measured motivation (scripts/
    # exp_config4.py at batch-8 1024px): in ISOLATION the packed
    # junction wins at this size (its pack/unpack concats are
    # half-res) while the packed tail LOSES (its pack copies are
    # full-res) — the docstring hypothesis above had it backwards at
    # high resolution; whole-pipeline pack2's −24% there is the tail's
    # loss swamping the junction's win. Requires pack2_junction=True;
    # mutually exclusive with pack2_tail_only.
    pack2_junction_only: bool = False
    # Ring-corrected reflect convs (round 4, VERDICT r3 item 3): run
    # every encoder/decoder conv as a zero-pad SAME conv (padding fused
    # into the conv HLO — the [B, H+2, W+2, C] reflect-padded copy never
    # exists in HBM) and splice in exact reflect borders recomputed from
    # thin strips (ops/convs.py::conv2d_reflect_ring). Bitwise-equal
    # math on CPU (tests/test_convs.py); on TPU the interior is the same
    # contraction, border strips are exact reflect values. The pad copy
    # scales with pixels, so this targets the high-resolution traffic-
    # bound tier (BASELINE config 4); pack2/junction-fused segments keep
    # their own conv calls and are unaffected.
    ring_conv: bool = False
    # Fold the encoder's linear 1×1 preprocessing conv0 into conv1_1
    # (ops/convs.py::compose_1x1_into_conv) so conv0's full-resolution
    # HLO never runs — it is a 3-of-128-lane HBM round trip XLA only
    # partially fuses (measured 57.2 → 52.3 ms for the conv0+conv1_1
    # pair at batch-8 1024px; ~5 encoder heads per 5-level cascade).
    # Identical math — both ops are linear and a per-pixel affine
    # commutes with reflect padding (the decode_folded argument);
    # fp rounding differs at weight-composition level. Incompatible
    # with fuse_junction (the Pallas head hard-codes conv0).
    compose_conv0: bool = False

    def __post_init__(self):
        from wct_tpu.models import vgg  # local: avoid import cycle

        bad = [t for t in self.relu_targets if t not in vgg.RELU_TARGETS]
        if bad or not self.relu_targets:
            raise ValueError(
                f"invalid relu_targets {bad or self.relu_targets}; "
                f"choose from {vgg.RELU_TARGETS}"
            )
        if len(set(self.relu_targets)) != len(self.relu_targets):
            raise ValueError(f"duplicate relu_targets {self.relu_targets}")
        if self.transform not in ("wct", "adain"):
            raise ValueError(f"transform must be 'wct'|'adain', got {self.transform!r}")
        if self.swap5 and "relu5_1" not in self.relu_targets:
            raise ValueError(
                "swap5=True but 'relu5_1' is not in relu_targets — the swap "
                "level would never run"
            )
        if self.passes < 1:
            raise ValueError(f"passes must be >= 1, got {self.passes}")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype {self.compute_dtype!r}")
        if self.conv_precision not in ("highest", "high"):
            raise ValueError(f"conv_precision {self.conv_precision!r}")
        if self.method not in (
            "eigh", "newton_schulz", "newton_schulz_fast",
            "newton_schulz_pallas", "auto",
        ):
            raise ValueError(f"unknown method {self.method!r}")
        if self.wct_groups < 1 or any(
            vgg.TARGET_CHANNELS[t] % self.wct_groups for t in self.relu_targets
        ):
            raise ValueError(
                f"wct_groups={self.wct_groups} must divide every level's "
                f"channel count "
                f"({ {t: vgg.TARGET_CHANNELS[t] for t in self.relu_targets} })"
            )
        if self.fuse_junction and self.fold_transform:
            raise ValueError(
                "fuse_junction and fold_transform are mutually exclusive "
                "(the junction kernel replaces the decoder tail the fold "
                "would rewrite)"
            )
        if self.rel_trunc is not None:
            if self.soft_trunc:
                raise ValueError(
                    "rel_trunc and soft_trunc are mutually exclusive "
                    "truncation modes"
                )
            if not 0.0 < self.rel_trunc < 1.0:
                raise ValueError(
                    f"rel_trunc must be in (0, 1), got {self.rel_trunc}"
                )
            if self.method != "eigh":
                raise ValueError(
                    "rel_trunc is a spectrum mask and requires "
                    f"method='eigh'; got method={self.method!r} (the "
                    "Newton–Schulz paths have no mask to apply — "
                    "ops/wct.py _sqrt_kernels)"
                )
        if self.ns_iters is not None and not isinstance(self.ns_iters, int):
            for pair in self.ns_iters:
                if (
                    not isinstance(pair, tuple) or len(pair) != 2
                    or pair[0] not in vgg.RELU_TARGETS
                    or not isinstance(pair[1], int)
                ):
                    raise ValueError(
                        "ns_iters must be None, an int, or a tuple of "
                        f"('reluN_1', iters) pairs; got {self.ns_iters!r}"
                    )
        if isinstance(self.ns_iters, int) and self.ns_iters < 1:
            raise ValueError(f"ns_iters must be >= 1, got {self.ns_iters}")
        if self.pack2_junction and (self.fuse_junction or self.fold_transform):
            raise ValueError(
                "pack2_junction is mutually exclusive with fuse_junction "
                "and fold_transform (all three rewrite the same decoder "
                "tail / encoder head segment)"
            )
        if self.pack2_tail_only and not self.pack2_junction:
            raise ValueError(
                "pack2_tail_only scopes pack2_junction and requires it "
                "to be enabled"
            )
        if self.pack2_junction_only and not self.pack2_junction:
            raise ValueError(
                "pack2_junction_only scopes pack2_junction and requires "
                "it to be enabled"
            )
        if self.compose_conv0 and self.fuse_junction:
            raise ValueError(
                "compose_conv0 is incompatible with fuse_junction (the "
                "Pallas encoder head hard-codes the separate conv0)"
            )
        if self.pack2_junction_only and self.pack2_tail_only:
            raise ValueError(
                "pack2_junction_only and pack2_tail_only are mutually "
                "exclusive scopes (each restricts pack2 to the OTHER "
                "segment)"
            )

    def ns_iters_for(self, level: str) -> int | None:
        """The content-side NS iteration override for one cascade level."""
        if self.ns_iters is None or isinstance(self.ns_iters, int):
            return self.ns_iters
        for target, iters in self.ns_iters:
            if target == level:
                return iters
        return None

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def lax_precision(self):
        return (
            jax.lax.Precision.HIGH
            if self.conv_precision == "high"
            else jax.lax.Precision.HIGHEST
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LevelStyle:
    """Per-level cached style statistics (whatever the config needs).

    ``fs_white`` (whitened raw style features) is only populated for
    the swap5 level; ``adain`` only for transform='adain'.
    """

    stats: wct_ops.StyleStats | None
    adain: adain_ops.AdainStats | None
    fs_white: jax.Array | None


StyleCache = dict[str, LevelStyle]  # relu target → LevelStyle


def init_params(key: jax.Array, targets: tuple[str, ...] = DEFAULT_TARGETS) -> dict:
    """Random full-model params: {'encoder': ..., 'decoders': {target: ...}}."""
    k_enc, *k_dec = jax.random.split(key, 1 + len(targets))
    return {
        "encoder": vgg.init_encoder_params(k_enc),
        "decoders": {
            t: dec_lib.init_decoder_params(k, t) for t, k in zip(targets, k_dec)
        },
    }


@partial(jax.jit, static_argnames=("cfg",))
def precompute_style(
    encoder_params: dict, style_img: jax.Array, cfg: CascadeConfig
) -> StyleCache:
    """Encode a style image ``[H, W, 3]`` once; cache per-level statistics.

    One trunk sweep (``encode_multi``) feeds every cascade level — the
    reference re-encodes the style through five truncated encoders.
    Jitted as ONE program: a style switch is a single device dispatch
    (this is the hot path of live style switching, BASELINE config 5).
    """
    feats = vgg.encode_multi(
        encoder_params, style_img[None].astype(cfg.dtype), cfg.relu_targets,
        precision=cfg.lax_precision, ring=cfg.ring_conv,
        compose_pre=cfg.compose_conv0,
    )
    cache: StyleCache = {}
    for level in cfg.relu_targets:
        fs = feats[level][0]
        stats = adain_st = fs_white = None
        if cfg.swap5 and level == "relu5_1":
            # One decomposition yields whitening + coloring kernels.
            w_s, k_s, mu_s = wct_ops.whiten_color_kernels(
                fs, method=cfg.method, soft_trunc=cfg.soft_trunc,
                rel_trunc=cfg.rel_trunc,
            )
            stats = wct_ops.StyleStats(kernel=k_s, mean=mu_s)
            hs, ws, c = fs.shape
            flat = fs.reshape(hs * ws, c).astype(jnp.float32)
            fs_white = ((flat - mu_s[None, :]) @ w_s).reshape(hs, ws, c)
        elif cfg.transform == "adain":
            adain_st = adain_ops.adain_stats(fs)
        else:
            stats = wct_ops.style_stats(
                fs, method=cfg.method, groups=cfg.wct_groups,
                soft_trunc=cfg.soft_trunc, rel_trunc=cfg.rel_trunc,
            )
        cache[level] = LevelStyle(stats=stats, adain=adain_st, fs_white=fs_white)
    return cache


@partial(jax.jit, static_argnames=("cfg",))
def interpolate_style_caches(
    caches: list[StyleCache], weights: jax.Array, cfg: CascadeConfig
) -> StyleCache:
    """Blend K styles' caches with ``weights: [K]`` (BASELINE config 3).

    WCT coloring and AdaIN are linear in their statistics, so blending
    cached stats ≡ blending colored features (SURVEY.md §A.2
    interpolation). swap5's raw features are not blendable; the swap
    level falls back to the first style's features. Jitted (weights
    traced): a weight change is one cheap dispatch, never a recompile.
    """
    out: StyleCache = {}
    w = weights
    for level in cfg.relu_targets:
        entries = [c[level] for c in caches]
        stats = adain_st = None
        if entries[0].stats is not None:
            stats = wct_ops.interpolate_stats([e.stats for e in entries], w)
        if entries[0].adain is not None:
            means = jnp.stack([e.adain.mean for e in entries])
            stds = jnp.stack([e.adain.std for e in entries])
            wf = w.astype(means.dtype)
            adain_st = adain_ops.AdainStats(
                mean=jnp.einsum("k,kc->c", wf, means),
                std=jnp.einsum("k,kc->c", wf, stds),
            )
        out[level] = LevelStyle(
            stats=stats, adain=adain_st, fs_white=entries[0].fs_white
        )
    return out


def _transform_level(
    fc: jax.Array,
    level: str,
    style: LevelStyle,
    alpha: jax.Array,
    cfg: CascadeConfig,
) -> jax.Array:
    """Apply the configured feature transform to ONE image's features."""
    if cfg.swap5 and level == "relu5_1":
        w_c, mu_c = wct_ops.whitening_kernel(
            fc, method=cfg.method, soft_trunc=cfg.soft_trunc,
            ns_iters=cfg.ns_iters_for(level), rel_trunc=cfg.rel_trunc,
        )
        h, w, c = fc.shape
        flat = fc.reshape(h * w, c).astype(jnp.float32)
        fc_white = ((flat - mu_c[None, :]) @ w_c).reshape(h, w, c)
        swapped = swap_ops.style_swap(
            fc_white, style.fs_white, cfg.ss_alpha, cfg.ss_patch_size, cfg.ss_stride
        )
        colored = (
            swapped.reshape(h * w, c) @ style.stats.kernel.astype(jnp.float32)
            + style.stats.mean.astype(jnp.float32)[None, :]
        )
        out = alpha * colored + (1.0 - alpha) * flat
        return out.reshape(h, w, c).astype(fc.dtype)
    if cfg.transform == "adain":
        return adain_ops.adain_from_stats(fc, style.adain, alpha)
    return wct_ops.wct_from_stats(
        fc, style.stats, alpha, method=cfg.method, groups=cfg.wct_groups,
        soft_trunc=cfg.soft_trunc, ns_iters=cfg.ns_iters_for(level),
        rel_trunc=cfg.rel_trunc,
    )


def stylize_fn(
    params: dict,
    content: jax.Array,
    style_cache: StyleCache,
    alpha: jax.Array | float,
    cfg: CascadeConfig,
) -> jax.Array:
    """The full cascade on a batch ``[B, H, W, 3]`` — pure, jit-friendly.

    Level loop and pass loop are Python loops over STATIC config, so
    jit unrolls them into one flat graph (mixed feature resolutions are
    fine: every shape is static given the input shape).

    Inputs whose H/W are not multiples of the deepest level's pool
    factor are reflect-padded up front and cropped back at the end —
    VALID pooling floor-halves but decoding exactly doubles, so without
    this a 511px image would come back 496px (output size must equal
    input size for keep-colors and video writers).
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    b, h, w, c = content.shape
    mult = max(vgg.TARGET_SCALE[t] for t in cfg.relu_targets)
    pad_h = (-h) % mult
    pad_w = (-w) % mult
    img = content.astype(cfg.dtype)
    if pad_h or pad_w:
        # reflect needs pad < dim; fall back to edge for tiny inputs.
        mode = "reflect" if (pad_h < h and pad_w < w) else "edge"
        img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode=mode)
    # Fused-junction eligibility is static (shapes are known at trace
    # time); ineligible shapes silently take the unfused path.
    junction_ok = (
        cfg.fuse_junction and (h + pad_h) % 16 == 0 and (w + pad_w) % 16 == 0
    )
    pack2_all = cfg.pack2_junction and b % 2 == 0
    # pack2_tail_only: junctions/head stay unpacked; only the relu1_1
    # tail packs (resolution-scoped — see CascadeConfig).
    pack2_ok = pack2_all and not cfg.pack2_tail_only
    # Packed relu1_1 tail (ops/pack2.py::tail_pack2): per-image stats,
    # the α-blended transform AND the final 64→3 conv all run on the
    # [B/2, ..., 128] packed pair — no 64→128 lane-padding copies.
    # Grouped WCT keeps the unpacked path (block-diag-of-block-diag is
    # not worth the plumbing).
    pack_tail_ok = (
        pack2_all and cfg.wct_groups == 1 and not cfg.pack2_junction_only
    )
    state_kind, state_val = "img", img
    for _ in range(cfg.passes):
        for li, level in enumerate(cfg.relu_targets):
            if (
                level == "relu1_1"
                and pack_tail_ok
                and state_kind in ("img", "e1p")
                and len(dec_lib.decoder_layers(level)) == 1
            ):
                from wct_tpu.ops import pack2

                enc = params["encoder"]
                if state_kind == "img":
                    e1p = pack2.head_pack2_shallow(
                        state_val,
                        enc["conv0"]["w"], enc["conv0"]["b"],
                        enc["conv1_1"]["w"], enc["conv1_1"]["b"],
                        precision=cfg.lax_precision, ring=cfg.ring_conv,
                        compose_pre=cfg.compose_conv0,
                    )
                else:
                    e1p = state_val
                style = style_cache[level]
                _, dname, *_ = dec_lib.decoder_layers(level)[0]
                dp = params["decoders"][level][dname]
                out = pack2.tail_pack2(
                    e1p, style.stats, alpha, dp["w"], dp["b"],
                    transform=cfg.transform, adain_stats=style.adain,
                    method=cfg.method, soft_trunc=cfg.soft_trunc,
                    ns_iters=cfg.ns_iters_for(level),
                    rel_trunc=cfg.rel_trunc,
                    precision=cfg.lax_precision, ring=cfg.ring_conv,
                )
                if cfg.clip_between_levels:
                    out = jnp.clip(out, 0.0, 1.0)
                state_kind, state_val = "img", out
                continue
            if state_kind == "img":
                if (junction_ok or pack2_ok) and level != "relu1_1":
                    # fused/packed encoder head: conv0∘conv1_1+conv1_2+pool1
                    enc = params["encoder"]
                    head_args = (
                        state_val,
                        enc["conv0"]["w"], enc["conv0"]["b"],
                        enc["conv1_1"]["w"], enc["conv1_1"]["b"],
                        enc["conv1_2"]["w"], enc["conv1_2"]["b"],
                    )
                    if pack2_ok:
                        from wct_tpu.ops import pack2

                        p1 = pack2.head_pack2(
                            *head_args, precision=cfg.lax_precision,
                            ring=cfg.ring_conv,
                            compose_pre=cfg.compose_conv0,
                        )
                    else:
                        from wct_tpu.ops import junction_pallas

                        p1 = junction_pallas.encoder_head(*head_args)
                    feats = vgg.encode_from_pool1(
                        params["encoder"], p1, level,
                        precision=cfg.lax_precision, ring=cfg.ring_conv,
                    )
                else:
                    feats = vgg.encode(
                        params["encoder"], state_val, level,
                        precision=cfg.lax_precision, ring=cfg.ring_conv,
                        compose_pre=cfg.compose_conv0,
                    )
            elif state_kind == "pooled":
                feats = vgg.encode_from_pool1(
                    params["encoder"], state_val, level,
                    precision=cfg.lax_precision, ring=cfg.ring_conv,
                )
            elif state_kind == "e1p":  # packed relu1_1 features, tail
                from wct_tpu.ops import pack2  # handler not applicable

                feats = pack2.unpack(state_val)
            else:  # 'e1' — the junction already produced relu1_1 features
                feats = state_val
            style = style_cache[level]
            # Fold only where it pays: the affine fold costs O(9·C³)
            # per image in weight-space and saves an O(N·C) feature-map
            # round trip — a win at the shallow levels (C ≤ 128, big
            # maps), a loss at relu3_1+ (C ≥ 256, tiny maps; measured
            # 72 → 52 fps when folding ALL levels at 512px/batch-16).
            foldable = (
                cfg.fold_transform
                and vgg.TARGET_CHANNELS[level] <= 128
                and not (cfg.swap5 and level == "relu5_1")
            )
            nxt = (
                cfg.relu_targets[li + 1]
                if li + 1 < len(cfg.relu_targets)
                else None
            )
            if foldable:
                if cfg.transform == "adain":
                    m, bias = jax.vmap(
                        lambda f: adain_ops.adain_transform(
                            f, style.adain, alpha
                        )
                    )(feats)
                else:
                    m, bias = jax.vmap(
                        lambda f: wct_ops.wct_transform(
                            f, style.stats, alpha, method=cfg.method,
                            groups=cfg.wct_groups, soft_trunc=cfg.soft_trunc,
                            ns_iters=cfg.ns_iters_for(level),
                            rel_trunc=cfg.rel_trunc,
                        )
                    )(feats)
                out = dec_lib.decode_folded(
                    params["decoders"][level], feats, level, m, bias,
                    precision=cfg.lax_precision,
                )
                if cfg.clip_between_levels:
                    out = jnp.clip(out, 0.0, 1.0)
                state_kind, state_val = "img", out
                continue
            if (
                junction_ok
                and len(dec_lib.decoder_layers(level)) == 1
                and not (cfg.swap5 and level == "relu5_1")
            ):  # pallas per-image-weight tail (pack2 keeps the XLA path)
                # Single-conv decoder (relu1_1): fold the per-image
                # WCT/AdaIN affine into the conv and run the Pallas
                # per-image-weight tail — the apply matmul, its layout
                # copies, AND the 64→3 conv collapse into one kernel.
                from wct_tpu.ops import junction_pallas

                if cfg.transform == "adain":
                    m, bias = jax.vmap(
                        lambda f: adain_ops.adain_transform(
                            f, style.adain, alpha
                        )
                    )(feats)
                else:
                    m, bias = jax.vmap(
                        lambda f: wct_ops.wct_transform(
                            f, style.stats, alpha, method=cfg.method,
                            groups=cfg.wct_groups, soft_trunc=cfg.soft_trunc,
                            ns_iters=cfg.ns_iters_for(level),
                            rel_trunc=cfg.rel_trunc,
                        )
                    )(feats)
                dec_p = params["decoders"][level]
                _, name, *_ = dec_lib.decoder_layers(level)[0]
                wf, bf = dec_lib.fold_affine_into_conv(
                    m, bias, dec_p[name]["w"], dec_p[name]["b"]
                )
                out = junction_pallas.decoder_tail(
                    feats, wf, bf, clip=cfg.clip_between_levels
                )
                state_kind, state_val = "img", out
                continue
            transformed = jax.vmap(
                lambda f: _transform_level(f, level, style, alpha, cfg)
            )(feats)
            use_pallas_j = (
                junction_ok
                and nxt is not None
                # the shallow (deep=False) pallas variant currently
                # hits a Mosaic backend failure; the 2→1 boundary runs
                # the XLA decode+encode until that is resolved
                and nxt != "relu1_1"
                and dec_lib.has_standard_tail(level)
            )
            use_pack2_j = (
                pack2_ok
                and nxt is not None
                and dec_lib.has_standard_tail(level)
            )
            if use_pallas_j or use_pack2_j:
                dec_p = params["decoders"][level]
                enc = params["encoder"]
                d = dec_lib.decode_partial(
                    dec_p, transformed, level, precision=cfg.lax_precision,
                    ring=cfg.ring_conv,
                )
                deep = nxt != "relu1_1"
                j_args = (
                    d,
                    *dec_lib.tail_weights(dec_p, level),
                    enc["conv0"]["w"], enc["conv0"]["b"],
                    enc["conv1_1"]["w"], enc["conv1_1"]["b"],
                    enc["conv1_2"]["w"], enc["conv1_2"]["b"],
                )
                if use_pack2_j:
                    from wct_tpu.ops import pack2

                    # Keep relu1_1 features PACKED when the packed tail
                    # will consume them (nxt == relu1_1 and the tail
                    # handler's static conditions hold).
                    keep_packed = (
                        not deep
                        and pack_tail_ok
                        and len(dec_lib.decoder_layers("relu1_1")) == 1
                    )
                    out = pack2.junction_pack2(
                        *j_args, deep=deep, clip=cfg.clip_between_levels,
                        unpack_out=not keep_packed,
                        precision=cfg.lax_precision, ring=cfg.ring_conv,
                        compose_pre=cfg.compose_conv0,
                    )
                    state_kind = (
                        "pooled" if deep else ("e1p" if keep_packed else "e1")
                    )
                    state_val = out
                else:
                    from wct_tpu.ops import junction_pallas

                    out = junction_pallas.junction(
                        *j_args, deep=deep, clip=cfg.clip_between_levels
                    )
                    state_kind, state_val = ("pooled" if deep else "e1"), out
            else:
                out = dec_lib.decode(
                    params["decoders"][level], transformed, level,
                    precision=cfg.lax_precision, ring=cfg.ring_conv,
                )
                if cfg.clip_between_levels:
                    out = jnp.clip(out, 0.0, 1.0)
                state_kind, state_val = "img", out
    # Reference clips once before save (stylize.py:~150).
    img = jnp.clip(state_val, 0.0, 1.0)
    return img[:, :h, :w, :]


@partial(jax.jit, static_argnames=("cfg",))
def stylize(
    params: dict,
    content: jax.Array,
    style_cache: StyleCache,
    alpha: jax.Array | float,
    cfg: CascadeConfig,
) -> jax.Array:
    """jit entry: one compiled graph per (cfg, shapes)."""
    return stylize_fn(params, content, style_cache, alpha, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def stylize_interp(
    params: dict,
    content: jax.Array,
    caches: list[StyleCache],
    weights: jax.Array,
    alpha: jax.Array | float,
    cfg: CascadeConfig,
) -> jax.Array:
    """Multi-style interpolation + cascade fused into ONE program.

    For weight/alpha sweeps (BASELINE config 3): the stat blend and the
    full cascade run in a single dispatch, so sweeping (weights, alpha)
    costs one compiled call per step — both are traced scalars/vectors,
    never a recompile.
    """
    cache = interpolate_style_caches(caches, weights, cfg)
    return stylize_fn(params, content, cache, alpha, cfg)


def stylize_pair(
    params: dict,
    content: jax.Array,
    style: jax.Array,
    alpha: jax.Array | float = 1.0,
    cfg: CascadeConfig = CascadeConfig(),
) -> jax.Array:
    """Convenience: single content [H,W,3] × style [H',W',3] → [H,W,3]."""
    cache = precompute_style(params["encoder"], style, cfg)
    return stylize(params, content[None], cache, alpha, cfg)[0]


def stylize_microbatched(
    params: dict,
    content: jax.Array,
    style_cache: StyleCache,
    alpha: jax.Array | float,
    cfg: CascadeConfig,
    microbatch: int = 8,
    stylize_fn=None,
) -> jax.Array:
    """Bitwise batch-size-stable serving: pad + chunk to a FIXED batch.

    The north star (BASELINE.json) requires an image's stylization to
    be bitwise-independent of the batch it was submitted in. Per-image
    math alone does not deliver that on TPU: XLA picks conv/reduction
    tilings PER COMPILED BATCH SHAPE, so programs compiled for batch 1
    vs batch 3 differ at the ULP level in some conv shapes (measured
    in the decoder stack on v5e), and ULPs amplify through untrained
    decoders. This wrapper therefore routes every request through the
    SAME ``[microbatch, H, W, 3]`` program: batches are padded (with
    repeats of the last frame) and chunked OUTSIDE jit, so one
    executable — hence one tiling — serves every batch size. Batch
    entries are mathematically independent, so an image's output slot
    never depends on its neighbors' data.

    Cost: padding waste on the final partial chunk. Use the serving
    batch as ``microbatch`` for throughput (e.g. 16 — identical speed
    to ``stylize`` on full batches); latency-critical streaming keeps
    calling ``stylize`` with batch 1 (one fixed program → stable too,
    but its bits differ from a ``microbatch=N`` program's — like any
    config change). Also bounds compile count to ONE batch shape.

    ``stylize_fn`` swaps the per-chunk executor while keeping the
    pad/chunk discipline — e.g. ``parallel.mesh.stylize_sharded`` (with
    mesh bound via functools.partial) for data-parallel serving, where
    ``microbatch`` should be a multiple of the mesh's data-axis size.
    """
    if microbatch < 1:
        raise ValueError(f"microbatch must be ≥ 1, got {microbatch}")
    if stylize_fn is None:
        stylize_fn = stylize
    b = content.shape[0]
    if b == 0:
        return content.astype(jnp.float32)
    outs = []
    for i in range(0, b, microbatch):
        chunk = content[i : i + microbatch]
        pad = microbatch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], pad, axis=0)]
            )
        out = stylize_fn(params, chunk, style_cache, alpha, cfg)
        outs.append(out[: microbatch - pad])
    return jnp.concatenate(outs)
