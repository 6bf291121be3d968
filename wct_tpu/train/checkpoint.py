"""Checkpointing: flat-npz pytrees (+ optional orbax for training state).

Replaces the reference's per-variable-scope ``tf.train.Saver``
checkpoints (SURVEY.md §5 checkpoint/resume row) with a portable
format: a pytree of arrays flattened to ``path/to/leaf`` keys in one
``.npz`` file. Used for the encoder bundle, each decoder, and full
training states (params + Adam moments + step), so a crashed run
resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        flat[prefix.rstrip(_SEP)] = np.asarray(tree)
    return flat


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return _maybe_listify(tree)


def _maybe_listify(node: Any) -> Any:
    """Turn {'0': ..., '1': ...} dicts (from saved lists) back into lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _maybe_listify(v) for k, v in node.items()}
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        return [node[str(i)] for i in range(len(keys))]
    return node


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    """Save a pytree of arrays as one ``.npz`` (atomic via temp rename)."""
    path = str(path)
    host_tree = jax.device_get(tree)
    flat = _flatten(host_tree)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_pytree(path: str | os.PathLike) -> Any:
    """Load an ``.npz`` checkpoint back into a (nested-dict/list) pytree."""
    with np.load(str(path)) as data:
        return _unflatten({k: data[k] for k in data.files})
