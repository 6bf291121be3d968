#!/usr/bin/env python
"""Render the committed per-round stylization sample grid.

    python scripts/make_sample_grid.py --bundle weights/bundle.npz \
        --out weights/samples/r5_grid.png [--size 256] [--alphas 0.6,1.0]

The third leg of the round-5 quality protocol (VERDICT r4 item 1c):
numbers argue, images arbitrate. Layout: first row = style images,
first column = content images, cell (i, j) = content_i stylized with
style_j (one cell block per alpha). Contents/styles are the same
deterministic set eval_style_quality.py scores (bundled real photos +
seeded procedural textures), so grid and metrics describe the same
outputs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bundle", default=str(REPO / "weights" / "bundle.npz"))
    ap.add_argument("--out", default=str(REPO / "weights" / "samples" / "grid.png"))
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--alphas", default="0.6,1.0")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import cascade
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import synthetic_image
    from wct_tpu.utils import images as img_utils

    sys.path.insert(0, str(REPO / "scripts"))
    from eval_style_quality import find_real_images  # noqa: E402

    enable_compile_cache()
    S = args.size
    alphas = tuple(float(a) for a in args.alphas.split(","))
    real = find_real_images(S)

    contents = []
    if real:
        contents.append(("photo", real[0]))
    contents.append(("proc", synthetic_image(np.random.default_rng(7), S)))

    styles = []
    if len(real) >= 2:
        styles.append(("photo2", real[1]))
    if len(real) >= 3:
        styles.append(("photo3", real[2]))
    styles.append(("proc_s", synthetic_image(np.random.default_rng(99), S)))

    params = checkpoint.load_pytree(args.bundle)
    cfg = cascade.CascadeConfig()
    caches = {
        name: cascade.precompute_style(params["encoder"], jnp.asarray(s), cfg)
        for name, s in styles
    }

    pad = 4
    ncol = 1 + len(styles)
    nrow = 1 + len(contents) * len(alphas)
    grid = np.ones((nrow * (S + pad) + pad, ncol * (S + pad) + pad, 3))

    def put(r, c, img):
        y, x = pad + r * (S + pad), pad + c * (S + pad)
        grid[y : y + S, x : x + S] = np.clip(img, 0, 1)

    for j, (_, s) in enumerate(styles):
        put(0, 1 + j, s)
    r = 1
    for _, c in contents:
        for alpha in alphas:
            put(r, 0, c)
            for j, (sname, _) in enumerate(styles):
                out = np.asarray(cascade.stylize(
                    params, jnp.asarray(c)[None], caches[sname], alpha, cfg
                )[0], np.float32)
                put(r, 1 + j, out)
            r += 1

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    img_utils.save_img(out_path, grid)
    print(f"wrote {out_path}  ({nrow}x{ncol} cells, alphas {alphas})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
