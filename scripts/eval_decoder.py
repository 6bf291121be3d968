#!/usr/bin/env python
"""Held-out reconstruction PSNR of one (or more) decoder npz files.

    python scripts/eval_decoder.py --encoder enc.npz \
        relu5_1=ckpt_r3w/ft_relu5_1/decoder_relu5_1.npz [...]

Same held-out recipe as scripts/eval_bundle.py (generator seed 12345,
8 images, 256px) so numbers are comparable across stages.
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
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("decoders", nargs="+", metavar="TARGET=PATH")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from wct_tpu.cli.common import enable_compile_cache
    from wct_tpu.models import decoder as dec_lib
    from wct_tpu.models import vgg
    from wct_tpu.train import checkpoint
    from wct_tpu.train.data import synthetic_image

    enable_compile_cache()
    enc = checkpoint.load_pytree(args.encoder)
    enc = enc["encoder"] if "encoder" in enc else enc
    rng = np.random.default_rng(args.seed)
    held = np.stack(
        [synthetic_image(rng, args.size) for _ in range(args.n_eval)]
    )
    held_j = jnp.asarray(held)
    for spec in args.decoders:
        target, _, path = spec.partition("=")
        tree = checkpoint.load_pytree(path)
        if target in tree:
            tree = tree[target]
        tree = tree.get("params", tree) if isinstance(tree, dict) else tree
        code = vgg.encode(enc, held_j, target)
        dec = np.asarray(dec_lib.decode(tree, code, target))
        mse = np.mean(
            (np.clip(dec, 0, 1).astype(np.float64) - held.astype(np.float64))
            ** 2
        )
        print(f"{target}: {10 * np.log10(1.0 / mse):.2f} dB  ({path})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
