"""Pure-numpy float64 reference implementation — the executable spec.

The reference pipeline's math (SURVEY.md §A.2: reflect-pad convs,
2×2 maxpool, nearest-neighbor upsample, WCT with eps on the Gram and
hard 1e-5 truncation, per-level decode, one final clip) re-expressed in
numpy/float64, independent of wct_tpu.ops. Used two ways:

- tests/test_fidelity.py pins the JAX pipeline against it per-op and
  end-to-end;
- scripts/exp_fidelity_envelope.py uses it as the neutral third
  implementation when measuring how far the speed configs drift from
  the f32+eigh path (the empirical meaning of BASELINE's "pixel-wise
  within eigensolver tolerance").

Mirrors reference stylize.py semantics (stylize.py:~90–150, model.py
test graph, ops.py:~65–140 — reconstructed, SURVEY.md §3.1/§3.4).
"""

from __future__ import annotations

import numpy as np

from wct_tpu.models import decoder as dec_lib
from wct_tpu.models import vgg


def conv2d_reflect_np(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """x [H,W,Cin], w [kh,kw,Cin,Cout] HWIO, reflect pad, valid conv."""
    kh = w.shape[0]
    p = (kh - 1) // 2
    if p:
        x = np.pad(x, ((p, p), (p, p), (0, 0)), mode="reflect")
    h, wd = x.shape[0] - kh + 1, x.shape[1] - kh + 1
    out = np.zeros((h, wd, w.shape[3]), np.float64)
    for di in range(kh):
        for dj in range(kh):
            out += np.tensordot(
                x[di : di + h, dj : dj + wd, :].astype(np.float64),
                w[di, dj].astype(np.float64),
                axes=([2], [0]),
            )
    return out + b.astype(np.float64)


def maxpool2_np(x: np.ndarray) -> np.ndarray:
    h, w, c = x.shape
    return x[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2, c).max((1, 3))


def upsample2_np(x: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(x, 2, axis=0), 2, axis=1)


def encode_np(enc_params: dict, img: np.ndarray, target: str) -> np.ndarray:
    x = img.astype(np.float64)
    for spec in vgg.layers_to(target):
        if spec[0] == "pool":
            x = maxpool2_np(x)
            continue
        _, name, *_ = spec
        p = enc_params[name]
        x = conv2d_reflect_np(x, np.asarray(p["w"]), np.asarray(p["b"]))
        if spec[0] == "conv":
            x = np.maximum(x, 0.0)
    return x


def decode_np(dec_params: dict, f: np.ndarray, target: str) -> np.ndarray:
    layers = dec_lib.decoder_layers(target)
    x = f
    for i, spec in enumerate(layers):
        if spec[0] == "upsample":
            x = upsample2_np(x)
            continue
        _, name, *_ = spec
        p = dec_params[name]
        x = conv2d_reflect_np(x, np.asarray(p["w"]), np.asarray(p["b"]))
        if i != len(layers) - 1:
            x = np.maximum(x, 0.0)
    return x


def wct_np(
    fc: np.ndarray,
    fs: np.ndarray,
    alpha: float,
    eps: float = 1e-8,
    trunc: float = 1e-5,
    force_k: tuple[int, int] | None = None,
) -> np.ndarray:
    """WCT per SURVEY §A.2 in float64 (blend vs UNCENTERED content).

    ``force_k=(k_c, k_s)``: top-k index truncation instead of the value
    threshold — the oracle counterpart of ``ops.wct``'s ``trunc_topk``
    (matched-mask gates; mechanism in DESIGN §2b).
    """
    c = fc.shape[-1]
    fc_flat = fc.reshape(-1, c)
    fs_flat = fs.reshape(-1, c)

    def sym_pow(flat, power, k=None):
        mu = flat.mean(0)
        centered = flat - mu
        cov = centered.T @ centered / (flat.shape[0] - 1) + eps * np.eye(c)
        s, u = np.linalg.eigh(cov)
        if k is not None:
            keep = np.arange(c) >= c - k
            s_pow = np.where(keep, np.sign(s) * np.abs(s) ** power, 0.0)
        else:
            s_pow = np.where(s > trunc, np.sign(s) * np.abs(s) ** power, 0.0)
        return (u * s_pow) @ u.T, mu

    kc, ks = force_k if force_k is not None else (None, None)
    w_c, mu_c = sym_pow(fc_flat, -0.5, kc)
    k_s, mu_s = sym_pow(fs_flat, +0.5, ks)
    colored = (fc_flat - mu_c) @ w_c @ k_s + mu_s
    return (alpha * colored + (1 - alpha) * fc_flat).reshape(fc.shape)


def wct_ranks_np(
    fc: np.ndarray, fs: np.ndarray, eps: float = 1e-8, trunc: float = 1e-5
) -> tuple[int, int]:
    """Float64 keep-counts (k_c, k_s) under the 1e-5 value threshold —
    the ground-truth ranks the matched-mask gates force into both
    implementations."""

    def rank(flat):
        c = flat.shape[-1]
        mu = flat.mean(0)
        centered = flat - mu
        cov = centered.T @ centered / (flat.shape[0] - 1) + eps * np.eye(c)
        s = np.linalg.eigvalsh(cov)
        return int((s > trunc).sum())

    return rank(fc.reshape(-1, fc.shape[-1])), rank(fs.reshape(-1, fs.shape[-1]))


def adain_np(fc: np.ndarray, fs: np.ndarray, alpha: float, eps: float = 1e-5):
    c = fc.shape[-1]
    cf = fc.reshape(-1, c).astype(np.float64)
    sf = fs.reshape(-1, c).astype(np.float64)
    out = (
        np.sqrt(sf.var(0) + eps) * (cf - cf.mean(0)) / np.sqrt(cf.var(0) + eps)
        + sf.mean(0)
    )
    return (alpha * out + (1 - alpha) * cf).reshape(fc.shape)


def cascade_np(
    params: dict,
    content: np.ndarray,
    style: np.ndarray,
    alpha: float,
    targets: tuple[str, ...],
    transform: str = "wct",
) -> np.ndarray:
    """Full multi-level cascade; ONE clip before save (stylize.py:~150)."""
    img = content.astype(np.float64)
    for t in targets:
        fc = encode_np(params["encoder"], img, t)
        fs = encode_np(params["encoder"], style, t)
        f = (wct_np if transform == "wct" else adain_np)(fc, fs, alpha)
        img = decode_np(params["decoders"][t], f, t)
    return np.clip(img, 0.0, 1.0)
