"""Batch stylization CLI — the rebuild of reference stylize.py (C8).

    python -m wct_tpu.cli.stylize --weights bundle.npz \
        --content-path c.jpg --style-path styles/ --out-path out/ \
        --alpha 0.8 --content-size 512 [--keep-colors] [--coral] ...

Content × style cartesian product (file or directory each), per-style
statistics cached and reused across all content images, one compiled
graph per image shape. Timing printed per image (as the reference
does) using a synced clock.
"""

from __future__ import annotations

import argparse
import itertools
import os
import time
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
    p.add_argument("--keep-colors", action="store_true",
                   help="luminance-only transfer (reference --keep-colors)")
    p.add_argument("--coral", action="store_true",
                   help="CORAL-match style colors to content first")
    p.add_argument("--concat", action="store_true",
                   help="paste style thumbnail beside the output")
    p.add_argument("--random-crop-style", action="store_true",
                   help="random square crop of the style (reference --random)")
    p.add_argument("--interp-weights", type=float, nargs="+", default=None,
                   help="blend ALL styles in --style-path with these weights "
                        "instead of iterating them")
    return p.parse_args(argv)


def _listdir_or_file(path: str) -> list[str]:
    return images.get_files(path) if os.path.isdir(path) else [path]


def _prep_content(path: str, args) -> np.ndarray:
    img = images.get_img(path)
    if args.content_size:
        img = images.resize_to(img, args.content_size)
    if args.crop_size:
        img = images.center_crop(img, args.crop_size)
    return img


def _prep_style(path: str, args, rng, content: np.ndarray) -> np.ndarray:
    img = images.get_img(path)
    if args.style_size:
        img = images.resize_to(img, args.style_size)
    if args.random_crop_style:
        side = min(img.shape[:2])
        img = images.random_crop(img, side, rng)
    if args.coral:
        img = colors.coral_numpy(img, content)
    return img


def main(argv=None) -> None:
    args = parse_args(argv)
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

    for c_path in content_files:
        content = _prep_content(c_path, args)
        c_dev = common.to_device_img(content)[None]

        if args.interp_weights is not None:
            caches = [
                cascade.precompute_style(
                    params["encoder"],
                    common.to_device_img(_prep_style(s, args, rng, content)),
                    cfg,
                )
                for s in style_files
            ]
            cache = cascade.interpolate_style_caches(
                caches, jnp.asarray(args.interp_weights, jnp.float32), cfg
            )
            pairs = [(None, cache)]
        else:
            pairs = [
                (
                    s_path,
                    cascade.precompute_style(
                        params["encoder"],
                        common.to_device_img(_prep_style(s_path, args, rng, content)),
                        cfg,
                    ),
                )
                for s_path in style_files
            ]

        for s_path, cache in pairs:
            t0 = time.perf_counter()
            out = cascade.stylize(params, c_dev, cache, args.alpha, cfg)
            stylized = np.asarray(out[0], dtype=np.float32)
            dt = time.perf_counter() - t0

            if args.keep_colors:
                stylized = colors.preserve_colors_np(content, stylized)
            if args.concat and s_path is not None:
                thumb = images.resize_exact(
                    images.get_img(s_path), stylized.shape[0], stylized.shape[0]
                )
                stylized = np.concatenate([stylized, thumb], axis=1)

            s_name = Path(s_path).stem if s_path else "interp"
            out_file = out_dir / f"{Path(c_path).stem}_{s_name}.png"
            images.save_img(out_file, stylized)
            print(f"{out_file}  ({dt * 1000:.0f} ms)")


if __name__ == "__main__":
    main()
