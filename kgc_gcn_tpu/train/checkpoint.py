"""Checkpointing: params + bn/opt state + best measure.

Reference policy (reference utils.py:121-155, main.py:159-163,222-225): save
``{state_dict, optim_dict, measure}`` to ``<dir>/last.ckpt`` only when val MRR
improves, so ``last.ckpt`` always holds the best weights; restore returns the
stored measure so best-tracking resumes correctly.

Two backends, same layout and policy:

  * ``npz`` (default) — dependency-free atomic single-file writer (flattened
    pytree leaves + treedef-by-template);
  * ``orbax`` — ``orbax.checkpoint.StandardCheckpointer`` directory
    checkpoints (TPU-native, async-capable, multi-host-aware); selected with
    ``backend="orbax"`` or auto-detected on restore.

Restore takes a template pytree (from a fresh ``model.init``) so custom
dataclass nodes round-trip exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

CKPT_NAME = "last.ckpt"
ORBAX_DIR = "last.orbax"
_MEASURE_KEY = "__measure__"


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def _fully_addressable(tree: Any) -> bool:
    return all(getattr(l, "is_fully_addressable", True)
               for l in jax.tree.leaves(tree))


def save_checkpoint(ckpt_dir: str, tree: Any, measure: float,
                    backend: str = "npz") -> str:
    """Save a pytree + scalar measure under ``ckpt_dir`` (policy: callers save
    only on val-MRR improvement, so 'last' always holds the best).

    Multi-process: leaves sharded across hosts are not fully addressable —
    the npz writer cannot assemble them, so such trees route to the orbax
    backend (which coordinates distributed writes itself); fully-addressable
    (replicated / single-host) trees are written by process 0 only.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    if backend == "npz" and not _fully_addressable(tree):
        backend = "orbax"
    if backend == "orbax":
        import orbax.checkpoint as ocp
        path = os.path.join(os.path.abspath(ckpt_dir), ORBAX_DIR)
        ckptr = ocp.StandardCheckpointer()
        # force=True delegates overwrite + atomic tmp-then-finalize-rename to
        # orbax, which coordinates across processes (a hand-rolled rmtree/
        # os.replace here would race N hosts on a shared filesystem)
        # the measure rides as a plain numpy scalar: a host-local
        # jax.Array is not serializable in a multi-host setting (orbax
        # requires global arrays or host values; caught by
        # tests/test_multiprocess.py)
        ckptr.save(path, {"tree": tree,
                          _MEASURE_KEY: np.asarray(measure, np.float32)},
                   force=True)
        ckptr.wait_until_finished()
        return path
    path = os.path.join(ckpt_dir, CKPT_NAME)
    if jax.process_index() != 0:
        return path   # replicated data: one writer (shared-FS race safety)
    leaves, _ = _flatten(tree)
    arrays = {}
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        if a.dtype.kind == "V" or not a.dtype.isnative or a.dtype.name not in \
                np.sctypeDict:
            # extended dtypes (bfloat16 via ml_dtypes): np.savez would write
            # an opaque void dtype that cannot round-trip — store the raw
            # bits plus the dtype name instead
            arrays[f"leaf_{i}__dtype"] = np.asarray(str(a.dtype))
            a = a.view(np.dtype(f"u{a.dtype.itemsize}"))
        arrays[f"leaf_{i}"] = a
    arrays[_MEASURE_KEY] = np.asarray(measure, np.float64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never corrupts the previous ckpt
    return path


def load_checkpoint(path: str, template: Any) -> Tuple[Any, float]:
    """Restore a pytree saved by ``save_checkpoint`` (either backend).

    ``template`` supplies the pytree structure (e.g. from ``model.init`` +
    ``optimizer.init``); leaf count and shapes must match.
    """
    path = os.path.normpath(path)   # 'run/last.orbax/' must still match below
    if os.path.isdir(path) and not path.endswith(".orbax"):
        orbax_path = os.path.join(path, ORBAX_DIR)
        path = orbax_path if os.path.isdir(orbax_path) \
            else os.path.join(path, CKPT_NAME)
    if os.path.isdir(path):   # orbax directory checkpoint
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path),
            {"tree": template, _MEASURE_KEY: np.asarray(0.0, np.float32)})
        return restored["tree"], float(restored[_MEASURE_KEY])
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    data = np.load(path)
    leaves, treedef = _flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if f"leaf_{i}__dtype" in data:        # extended dtype (e.g. bfloat16)
            import ml_dtypes  # noqa: F401 — registers the dtype names
            arr = arr.view(np.dtype(str(data[f"leaf_{i}__dtype"])))
        if leaf is not None and hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {leaf.shape}")
        restored.append(jax.numpy.asarray(arr))
    measure = float(data[_MEASURE_KEY]) if _MEASURE_KEY in data else 0.0
    return jax.tree.unflatten(treedef, restored), measure


# -------------------------------------------------- periodic async checkpoints

PERIODIC_DIR = "periodic.orbax"
_ASYNC_CKPTR = None
_PENDING: Optional[Tuple[str, str]] = None   # (tmp_path, final_path) in flight


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def _promote_pending() -> None:
    """After the in-flight write committed, atomically replace the previous
    periodic checkpoint — a crash mid-write never loses the last good one.
    Filesystem promotion is process-0-only (every process calls the orbax
    save collectively, but exactly one may move directories on a shared FS).
    """
    global _PENDING
    if _PENDING is None:
        return
    import shutil
    tmp, final = _PENDING
    _PENDING = None
    if jax.process_index() != 0:
        return
    if os.path.isdir(tmp):
        # rename-aside so one loadable checkpoint exists at every instant:
        # old -> .old, tmp -> final, then drop .old (a crash between the two
        # renames leaves the previous save recoverable at .old)
        old = final + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(final):
            os.replace(final, old)
        os.replace(tmp, final)
        shutil.rmtree(old, ignore_errors=True)


def save_checkpoint_async(ckpt_dir: str, tree: Any, measure: float) -> str:
    """Fire-and-forget periodic checkpoint (SURVEY.md §5.3/5.4): the orbax
    AsyncCheckpointer copies device buffers to host immediately and writes in
    a background thread — training dispatch continues while I/O runs.  Writes
    land in a tmp directory and are promoted to ``<dir>/periodic.orbax`` at
    the next join, so the latest COMPLETE periodic save is always restorable
    via ``load_checkpoint(<dir>/periodic.orbax, ...)`` even across a crash
    mid-write.  A new save joins the previous one first (at most one write in
    flight).

    Unlike ``save_checkpoint`` (save-on-improvement = the reference's
    best-tracking policy, utils.py:121-135), this is crash insurance on a
    fixed cadence (``--ckpt_every``)."""
    global _PENDING
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), PERIODIC_DIR)
    tmp = path + ".tmp"
    ckptr = _async_ckptr()
    ckptr.wait_until_finished()             # join the previous in-flight save
    _promote_pending()
    if jax.process_index() == 0:            # shared-FS cleanup: one actor
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    ckptr.save(tmp, {"tree": tree,
                     _MEASURE_KEY: np.asarray(measure, np.float32)})
    _PENDING = (tmp, path)
    return path


def wait_for_async_checkpoints() -> None:
    """Block until any in-flight periodic save has committed and promoted."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
        _promote_pending()
