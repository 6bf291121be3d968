"""Checkpointing: flat-npz pytrees + an orbax training-state backend.

Replaces the reference's per-variable-scope ``tf.train.Saver``
checkpoints (SURVEY.md §5 checkpoint/resume row) with a portable
format: a pytree of arrays flattened to ``path/to/leaf`` keys in one
``.npz`` file. Used for the encoder bundle, each decoder, and full
training states (params + Adam moments + step), so a crashed run
resumes exactly.

``TrainCheckpointer`` wraps the periodic training-state save/restore
behind one interface with two backends: ``npz`` (single
``state_latest.npz``, atomic rename) and ``orbax``
(``orbax.checkpoint.CheckpointManager``: step-indexed directories with
retention — the SURVEY.md §5 "periodic orbax checkpointing" row).
Both backends round-trip the same canonical nested-dict/list tree, so
the resume path is backend-agnostic.
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
    """Save a pytree of arrays as one ``.npz`` (atomic via temp rename).

    Note: ``load_pytree``'s default ``upcast_f16=True`` means float16
    leaves do NOT round-trip dtype through save/load — pass
    ``upcast_f16=False`` on load when f16 storage must be preserved.
    """
    path = str(path)
    host_tree = jax.device_get(tree)
    flat = _flatten(host_tree)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_pytree(path: str | os.PathLike, upcast_f16: bool = True) -> Any:
    """Load an ``.npz`` checkpoint back into a (nested-dict/list) pytree.

    With ``upcast_f16=True`` (default) float16 leaves are upcast to
    float32 on load: f16 is normally a pure STORAGE format here
    (``make_bundle --store-dtype float16`` halves the committed
    artifact), nothing in the framework computes in f16, and mixed
    f16/f32 dtypes would trip ``lax.conv`` dtype matching. Callers that
    need the stored dtypes verbatim (e.g. inspecting a converted
    reference checkpoint) pass ``upcast_f16=False`` (ADVICE r2: the
    unconditional upcast broke dtype round-tripping for ALL npz files).
    """
    with np.load(str(path)) as data:
        return _unflatten({
            k: (data[k].astype(np.float32)
                if upcast_f16 and data[k].dtype == np.float16 else data[k])
            for k in data.files
        })


def canonicalize(tree: Any) -> Any:
    """Reduce a pytree (incl. namedtuples) to nested dicts/lists of arrays.

    Exactly the structure ``load_pytree`` produces for the same tree,
    so orbax- and npz-saved training states restore identically and the
    opt-state rebuild (leaves → optimizer structure) works for both.
    """
    return _unflatten(_flatten(jax.device_get(tree)))


class TrainCheckpointer:
    """Periodic training-state checkpoints with ``npz``/``orbax`` backends.

    npz: one ``<dir>/state_latest.npz`` overwritten atomically — the
    minimal-footprint default. orbax: ``<dir>/orbax/<step>/`` managed
    by ``CheckpointManager`` with ``keep`` most-recent retained, so a
    bad step can be rolled back. ``save`` is synchronous in both
    (save-on-signal must be durable before the process exits).
    """

    def __init__(self, ckpt_dir: str | os.PathLike, fmt: str = "npz",
                 keep: int = 3):
        if fmt not in ("npz", "orbax"):
            raise ValueError(f"unknown checkpoint format: {fmt!r}")
        self.fmt = fmt
        self.dir = os.path.abspath(str(ckpt_dir))
        os.makedirs(self.dir, exist_ok=True)
        self._mngr = None
        if fmt == "orbax":
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mngr = ocp.CheckpointManager(
                os.path.join(self.dir, "orbax"),
                options=ocp.CheckpointManagerOptions(max_to_keep=keep),
            )

    @property
    def _npz_path(self) -> str:
        return os.path.join(self.dir, "state_latest.npz")

    def save(self, step: int, tree: Any) -> None:
        if self._mngr is None:
            # save_pytree flattens/device_gets itself — canonicalizing
            # here would walk + host-transfer the state twice.
            save_pytree(self._npz_path, tree)
            return
        if self._mngr.latest_step() == step:
            return  # e.g. save-iter boundary + save-on-signal same step
        self._mngr.save(
            step, args=self._ocp.args.StandardSave(canonicalize(tree))
        )
        self._mngr.wait_until_finished()

    def restore_latest(self) -> Any | None:
        """Latest saved training state (canonical tree) or None."""
        if self._mngr is None:
            if not os.path.exists(self._npz_path):
                return None
            return load_pytree(self._npz_path)
        step = self._mngr.latest_step()
        if step is None:
            return None
        return canonicalize(self._mngr.restore(step))

    def close(self) -> None:
        if self._mngr is not None:
            self._mngr.close()
