"""Batch stylization CLI — the rebuild of reference stylize.py (C8).

    python -m wct_tpu.cli.stylize --weights bundle.npz \
        --content-path c.jpg --style-path styles/ --out-path out/ \
        --alpha 0.8 --content-size 512 [--keep-colors] [--coral] ...

Content × style cartesian product (file or directory each). Per-style
statistics are cached and reused across all content images; same-shape
content images are batched (``--batch-size``) so the TPU runs full
batches (BASELINE config 4), one compiled graph per image shape.
"""

from __future__ import annotations

import argparse
import time
from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from wct_tpu.cli import common
from wct_tpu.models import cascade
from wct_tpu.utils import colors, images


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_flags(p)
    p.add_argument("--content-path", required=True, help="image file or dir")
    p.add_argument("--style-path", required=True, help="image file or dir")
    p.add_argument("--out-path", required=True, help="output dir")
    p.add_argument("--content-size", type=int, default=0,
                   help="resize content shorter side (0 = keep)")
    p.add_argument("--style-size", type=int, default=0,
                   help="resize style shorter side (0 = keep)")
    p.add_argument("--crop-size", type=int, default=0,
                   help="center-crop content to this square (0 = off)")
    p.add_argument("--batch-size", type=int, default=4,
                   help="batch same-shaped content images per dispatch")
    p.add_argument("--keep-colors", action="store_true",
                   help="luminance-only transfer (reference --keep-colors)")
    p.add_argument("--coral", action="store_true",
                   help="CORAL-match style colors to content first "
                        "(forces per-pair processing)")
    p.add_argument("--concat", action="store_true",
                   help="paste style thumbnail beside the output")
    p.add_argument("--random-crop-style", action="store_true",
                   help="random square crop of the style (reference --random)")
    p.add_argument("--interp-weights", type=float, nargs="+", default=None,
                   help="blend ALL styles in --style-path with these weights "
                        "instead of iterating them")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each batch over all local devices "
                        "(--batch-size must be a multiple of the device "
                        "count; new vs reference — it is single-device)")
    return p.parse_args(argv)


_listdir_or_file = images.list_images


def _prep_content(path: str, args) -> np.ndarray:
    img = images.get_img(path)
    if args.content_size:
        img = images.resize_to(img, args.content_size)
    if args.crop_size:
        img = images.center_crop(img, args.crop_size)
    return img


def _content_shape(path: str, args) -> tuple[int, int]:
    """Post-prep (H, W) from the image header only (no pixel decode).

    Lets shape-grouping scan thousands of files without holding their
    pixels in RAM; the actual decode happens per batch chunk.
    """
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    if args.content_size:
        s = args.content_size
        h, w = (s, max(1, round(w * s / h))) if h < w else (max(1, round(h * s / w)), s)
    if args.crop_size:
        return args.crop_size, args.crop_size
    return h, w


def _prep_style(path: str, args, rng, content: np.ndarray | None) -> np.ndarray:
    img = images.get_img(path)
    if args.style_size:
        img = images.resize_to(img, args.style_size)
    if args.random_crop_style:
        side = min(img.shape[:2])
        img = images.random_crop(img, side, rng)
    if args.coral and content is not None:
        img = colors.coral_numpy(img, content)
    return img


_thumb_cache: dict[tuple, np.ndarray] = {}


def _style_thumb(s_path: str, size: int) -> np.ndarray:
    """Style thumbnail for --concat, cached per (style, size) — avoids
    re-decoding the same style file for every output image."""
    key = (s_path, size)
    if key not in _thumb_cache:
        _thumb_cache[key] = images.resize_exact(images.get_img(s_path), size, size)
    return _thumb_cache[key]


def _save_outputs(stylized_batch, contents, names, s_path, args, out_dir):
    for out, content, name in zip(stylized_batch, contents, names):
        out = np.asarray(out, dtype=np.float32)
        if args.keep_colors:
            out = colors.preserve_colors_np(content, out)
        if args.concat and s_path is not None:
            out = np.concatenate([out, _style_thumb(s_path, out.shape[0])], axis=1)
        s_name = Path(s_path).stem if s_path else "interp"
        out_file = out_dir / f"{name}_{s_name}.png"
        images.save_img(out_file, out)
        print(out_file)


def main(argv=None) -> None:
    args = parse_args(argv)
    common.enable_compile_cache()
    cfg = common.config_from_args(args)
    params = common.load_params(args)
    out_dir = Path(args.out_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    content_files = _listdir_or_file(args.content_path)
    style_files = _listdir_or_file(args.style_path)
    print(f"{len(content_files)} content × {len(style_files)} style images")

    if args.interp_weights is not None:
        if len(args.interp_weights) != len(style_files):
            raise SystemExit(
                f"--interp-weights needs {len(style_files)} weights "
                f"(one per style), got {len(args.interp_weights)}"
            )
        if args.coral:
            raise SystemExit(
                "--coral cannot combine with --interp-weights: CORAL "
                "recolors the style per content image while interpolation "
                "blends one shared style-stat cache"
            )

    stylize_fn = None  # default: single-device cascade.stylize
    if args.data_parallel:
        import functools

        import jax

        from wct_tpu.parallel import mesh as mesh_lib

        n_dev = len(jax.devices())
        if args.batch_size % max(n_dev, 1):
            raise SystemExit(
                f"--data-parallel: --batch-size {args.batch_size} must be "
                f"a multiple of the device count ({n_dev})"
            )
        if args.coral:
            raise SystemExit(
                "--coral processes one pair at a time and cannot shard; "
                "drop --data-parallel or --coral"
            )
        mesh = mesh_lib.create_mesh()
        stylize_fn = functools.partial(mesh_lib.stylize_sharded, mesh=mesh)
        print(f"[stylize] data-parallel over {n_dev} devices")

    t_start = time.perf_counter()
    n_out = 0

    if args.coral:
        # CORAL recolors the style per content image → per-pair path.
        for c_path in content_files:
            content = _prep_content(c_path, args)
            name = Path(c_path).stem
            c_dev = common.to_device_img(content)[None]
            for s_path in style_files:
                style = _prep_style(s_path, args, rng, content)
                cache = cascade.precompute_style(
                    params["encoder"], common.to_device_img(style), cfg
                )
                out = cascade.stylize(params, c_dev, cache, args.alpha, cfg)
                _save_outputs(out, [content], [name], s_path, args, out_dir)
                n_out += 1
    else:
        # Group by POST-PREP shape from image headers only — pixels are
        # decoded lazily per chunk so huge content dirs don't exhaust
        # host RAM.
        groups: dict[tuple, list[str]] = defaultdict(list)
        for c_path in content_files:
            groups[_content_shape(c_path, args)].append(c_path)

        if args.interp_weights is not None:
            caches = [
                cascade.precompute_style(
                    params["encoder"],
                    common.to_device_img(_prep_style(s, args, rng, None)),
                    cfg,
                )
                for s in style_files
            ]
            weights = jnp.asarray(args.interp_weights, jnp.float32)
            pairs = [(None, cascade.interpolate_style_caches(caches, weights, cfg))]
        else:
            pairs = [
                (
                    s_path,
                    cascade.precompute_style(
                        params["encoder"],
                        common.to_device_img(_prep_style(s_path, args, rng, None)),
                        cfg,
                    ),
                )
                for s_path in style_files
            ]

        for s_path, cache in pairs:
            for group in groups.values():
                # ONE fixed-batch program per shape: partial chunks are
                # padded inside stylize_microbatched, so every image
                # runs through the same compiled graph — no remainder
                # recompile, and outputs are bitwise-independent of how
                # many same-shape files happened to be in the run
                # (micro must NOT depend on len(group) for that).
                micro = args.batch_size
                for i in range(0, len(group), args.batch_size):
                    chunk = group[i : i + args.batch_size]
                    arrs = [_prep_content(p, args) for p in chunk]
                    out = cascade.stylize_microbatched(
                        params,
                        jnp.asarray(np.stack(arrs), jnp.float32),
                        cache,
                        args.alpha,
                        cfg,
                        microbatch=micro,
                        stylize_fn=stylize_fn,
                    )
                    _save_outputs(
                        out,
                        arrs,
                        [Path(p).stem for p in chunk],
                        s_path,
                        args,
                        out_dir,
                    )
                    n_out += len(chunk)

    dt = time.perf_counter() - t_start
    print(f"{n_out} outputs in {dt:.1f}s ({n_out / max(dt, 1e-9):.2f} img/s)")


if __name__ == "__main__":
    main()
