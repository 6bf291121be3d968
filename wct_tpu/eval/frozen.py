"""Frozen never-trained random evaluator encoder for Gram scoring.

The second leg of the round-5 quality protocol (VERDICT r4 item 1):
a CReLU-paired semi-orthogonal VGG-architecture encoder, generated
deterministically from a pinned seed and NEVER trained, so no bundle
under evaluation can be favoured by construction. Gram/mean-std
distances under it complement the pixel-space metrics
(eval/texture.py): random-filter Gram matrices are an established
texture statistic (multi-channel, multi-scale local correlations),
and because the evaluator is fixed across rounds the numbers are
comparable forever.

Why CReLU-paired semi-orthogonal (same construction the round-2/3
stand-in encoder used, scripts/exp_encoder_variants.py): each conv's
±-paired orthonormal patch directions make ReLU information-lossless
(relu(x) − relu(−x) = x), so deep features of a 16-conv random trunk
stay non-degenerate — a plain He-random trunk collapses by relu5_1.

Determinism: weights come from ``numpy.random.default_rng(SEED)``
(Philox/PCG stream — stable across numpy versions by policy) and a
QR decomposition canonicalised to a unique Q (diag(R) > 0), which
removes the only LAPACK-implementation freedom. A fingerprint test
(tests/test_eval_metrics.py) pins the generated weights; if any
platform ever drifts, the gate fails loudly rather than silently
changing every historical number.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

SEED = 20260819  # pinned forever; changing it invalidates all history

_TARGETS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")


def _semi_orth(rng: np.random.Generator, d_in: int, d_out: int) -> np.ndarray:
    """[d_in, d_out] with orthonormal columns, canonicalised (unique Q)."""
    a = rng.standard_normal((max(d_in, d_out), min(d_in, d_out)))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))[None, :]  # diag(R) > 0 → Q unique
    return (q if d_in >= d_out else q.T).astype(np.float32)


@functools.lru_cache(maxsize=1)
def evaluator_params() -> dict:
    """The frozen evaluator's weights (cached; ~4 s to generate).

    VGG-19 trunk architecture (models/vgg.py ENCODER_LAYERS) with the
    canonical conv0 preprocessing and CReLU-paired semi-orthogonal
    3×3 convs, all biases zero.
    """
    import jax.numpy as jnp

    from wct_tpu.models import vgg

    rng = np.random.default_rng(SEED)
    params: dict = {}
    for spec in vgg.ENCODER_LAYERS:
        if spec[0] == "pool":
            continue
        _, name, in_c, out_c, k = spec
        if name == "conv0":
            w = np.zeros((1, 1, 3, 3), np.float32)
            for o, i in enumerate((2, 1, 0)):
                w[0, 0, i, o] = 255.0
            b = -np.array([103.939, 116.779, 123.68], np.float32)
        else:
            d = k * k * in_c
            m = out_c // 2
            u = _semi_orth(rng, d, m)
            w = np.concatenate([u, -u], axis=1).reshape(k, k, in_c, out_c)
            b = np.zeros((out_c,), np.float32)
        params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return params


def fingerprint() -> str:
    """SHA-256 over every weight tensor's bytes, layer-name order."""
    import jax

    h = hashlib.sha256()
    params = evaluator_params()
    for name in sorted(params):
        for k in sorted(params[name]):
            h.update(np.asarray(jax.device_get(params[name][k])).tobytes())
    return h.hexdigest()


# Pinned at creation (round 5). tests/test_eval_metrics.py asserts it.
FINGERPRINT = "96f81337d03c18bb3ccd92782c32e7297e1655e3ea584c8901f33826b43562fb"


def gram_stats(img: np.ndarray, targets: tuple[str, ...] = _TARGETS) -> dict:
    """Per-level Gram + mean/std of ``img [H, W, 3]`` under the frozen
    evaluator (f32 on device, f64 on host)."""
    import jax
    import jax.numpy as jnp

    from wct_tpu.models import vgg

    @functools.partial(jax.jit, static_argnames=("tgts",))
    def _feats(p, x, tgts):
        acts = vgg.encode_multi(p, x[None].astype(jnp.float32), tgts)
        out = {}
        for t in tgts:
            f = acts[t][0].reshape(-1, acts[t].shape[-1])
            out[t] = {
                "gram": f.T @ f / f.shape[0],
                "mean": f.mean(0),
                "std": f.std(0),
            }
        return out

    res = jax.device_get(_feats(evaluator_params(), jnp.asarray(img), targets))
    return {
        t: {k: np.asarray(v, np.float64) for k, v in res[t].items()}
        for t in targets
    }


def _rel(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def gram_distance(
    out_img: np.ndarray,
    style_stats: dict,
    targets: tuple[str, ...] = _TARGETS,
) -> dict:
    """Relative Gram / mean-std distances of ``out_img`` against
    precomputed ``gram_stats(style)`` under the frozen evaluator."""
    o = gram_stats(np.clip(out_img, 0.0, 1.0), targets)
    gram = {t: _rel(o[t]["gram"], style_stats[t]["gram"]) for t in targets}
    meanstd = {
        t: 0.5 * (_rel(o[t]["mean"], style_stats[t]["mean"])
                  + _rel(o[t]["std"], style_stats[t]["std"]))
        for t in targets
    }
    return {
        "frozen_gram_rel": float(np.mean(list(gram.values()))),
        "frozen_gram_rel_per_level": gram,
        "frozen_meanstd_rel": float(np.mean(list(meanstd.values()))),
    }
