"""Checkpointing: params + bn/opt state + best measure.

Reference policy (reference utils.py:121-155, main.py:159-163,222-225): save
``{state_dict, optim_dict, measure}`` to ``<dir>/last.ckpt`` only when val MRR
improves, so ``last.ckpt`` always holds the best weights; restore returns the
stored measure so best-tracking resumes correctly.

Implementation: a dependency-free atomic ``.npz`` writer (flattened pytree
leaves + treedef-by-template).  Restore takes a template pytree (from a fresh
``model.init``) so custom dataclass nodes round-trip exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

CKPT_NAME = "last.ckpt"


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_checkpoint(ckpt_dir: str, tree: Any, measure: float) -> str:
    """Save a pytree + scalar measure to ``<ckpt_dir>/last.ckpt`` (npz)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, CKPT_NAME)
    leaves, _ = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__measure__"] = np.asarray(measure, np.float64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never corrupts the previous ckpt
    return path


def load_checkpoint(path: str, template: Any) -> Tuple[Any, float]:
    """Restore a pytree saved by ``save_checkpoint``.

    ``template`` supplies the pytree structure (e.g. from ``model.init`` +
    ``optimizer.init``); leaf count and shapes must match.
    """
    if os.path.isdir(path):
        path = os.path.join(path, CKPT_NAME)
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    data = np.load(path)
    leaves, treedef = _flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if leaf is not None and hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {leaf.shape}")
        restored.append(jax.numpy.asarray(arr))
    measure = float(data["__measure__"]) if "__measure__" in data else 0.0
    return jax.tree.unflatten(treedef, restored), measure
