"""Pytree checkpointing to .npz artifacts.

Replaces the reference's `torch.save({model_state, optimizer_state, ...})`
trainer checkpoints (pinsage_training.py:288-295) with a torch-free format:
every pytree leaf is stored under its key-path string in a single .npz.
Writes are atomic (tmp file + rename) so a killed run never leaves a corrupt
checkpoint — the reference wrote in place every batch (SURVEY §7b.11).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in leaves}


def save_pytree(path: str, tree: Any, scalars: dict[str, float] | None = None
                ) -> None:
    """Save a pytree (+ optional scalar metadata) to `path` (.npz)."""
    payload = _flatten(tree)
    for name, value in (scalars or {}).items():
        payload["__scalar__" + name] = np.asarray(value)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any) -> tuple[Any, dict[str, float]]:
    """Load a pytree saved by `save_pytree` into `template`'s structure.

    Returns (tree, scalars).  Raises KeyError if the stored leaves do not
    match the template (shape-validated reload, like the reference
    neighborhood cache, pinsage_model.py:113-116).
    """
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}
    scalars = {k[len("__scalar__"):]: float(v)
               for k, v in stored.items() if k.startswith("__scalar__")}

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_key, leaf in paths_and_leaves:
        name = jax.tree_util.keystr(path_key)
        if name not in stored:
            raise KeyError(f"checkpoint {path} missing leaf {name}")
        arr = stored[name]
        want = np.asarray(leaf)
        if arr.shape != want.shape:
            raise ValueError(f"checkpoint leaf {name} has shape {arr.shape}, "
                             f"expected {want.shape}")
        new_leaves.append(arr.astype(want.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), scalars
