"""ctypes bridge to the native graphcore library (native/graphcore.cpp).

Builds ``libgraphcore.so`` on first use with g++ (cached next to the source);
every entry point has a pure-Python fallback, so the framework works without a
compiler.  ``load_corpus_native`` parses the three TSV triple files and
returns id arrays + vocab in the exact first-seen/lowercased order of the
Python path (kgc_gcn_tpu.data.dataset).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "graphcore.cpp")


def _build_lib() -> Optional[str]:
    so_path = os.path.join(os.path.dirname(_SRC), "libgraphcore.so")
    if os.path.exists(so_path) and (
            os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", so_path],
            check=True, capture_output=True, timeout=300)
        return so_path
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SRC):
        return None
    so = _build_lib()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.gc_load_corpus.restype = ctypes.c_void_p
    lib.gc_load_corpus.argtypes = [ctypes.c_char_p] * 3
    lib.gc_error.restype = ctypes.c_char_p
    lib.gc_error.argtypes = [ctypes.c_void_p]
    lib.gc_num_entities.restype = ctypes.c_int32
    lib.gc_num_entities.argtypes = [ctypes.c_void_p]
    lib.gc_num_relations.restype = ctypes.c_int32
    lib.gc_num_relations.argtypes = [ctypes.c_void_p]
    lib.gc_num_triples.restype = ctypes.c_int64
    lib.gc_num_triples.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.gc_copy_triples.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.gc_vocab_bytes.restype = ctypes.c_int64
    lib.gc_vocab_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.gc_copy_vocab.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_char_p]
    lib.gc_free.argtypes = [ctypes.c_void_p]
    lib.gc_build_half.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    # the grouper entry points postdate the parser/half-builder; a stale
    # .so (e.g. mtime-preserving restore) may lack them — bind them only if
    # present and let group_sr2o_native fall back to the numpy path
    if hasattr(lib, "gc_group_sr2o_splits"):   # the newest grouper symbol
        lib.gc_group_sr2o.restype = ctypes.c_void_p
        lib.gc_group_sr2o.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int32]
        lib.gc_group_sr2o_splits.restype = ctypes.c_void_p
        lib.gc_group_sr2o_splits.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
        lib.gc_group2_get.restype = ctypes.c_void_p
        lib.gc_group2_get.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.gc_group2_free.argtypes = [ctypes.c_void_p]
        lib.gc_group_n.restype = ctypes.c_int64
        lib.gc_group_n.argtypes = [ctypes.c_void_p]
        lib.gc_group_nvals.restype = ctypes.c_int64
        lib.gc_group_nvals.argtypes = [ctypes.c_void_p]
        lib.gc_group_copy.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        lib.gc_group_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "gc_locality_order"):   # postdates the grouper (round 3)
        lib.gc_locality_order.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    _LIB = lib
    return _LIB


def load_corpus_native(
    train_path: str, valid_path: str, test_path: str
) -> Optional[Tuple[Dict[str, int], Dict[str, int], Dict[str, np.ndarray]]]:
    """Parse TSV triples natively; returns (entity2id, relation2id (forward
    only), {split: (n,3) int64 triples}) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.gc_load_corpus(train_path.encode(), valid_path.encode(),
                           test_path.encode())
    try:
        err = lib.gc_error(h)
        if err:
            raise ValueError(err.decode())
        triples = {}
        for i, split in enumerate(("train", "valid", "test")):
            n = lib.gc_num_triples(h, i)
            out = np.empty((n, 3), np.int32)
            if n:
                lib.gc_copy_triples(h, i, out.reshape(-1))
            triples[split] = out.astype(np.int64)
        vocabs = []
        for which in (0, 1):
            buf = ctypes.create_string_buffer(int(lib.gc_vocab_bytes(h, which)))
            lib.gc_copy_vocab(h, which, buf)
            names = buf.value.decode().split("\n")[:-1]
            vocabs.append({name: i for i, name in enumerate(names)})
        return vocabs[0], vocabs[1], triples
    finally:
        lib.gc_free(h)


def build_half_native(src: np.ndarray, dst: np.ndarray, n_ent: int
                      ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(perm, indptr, norm) for one CSR half, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    e = len(src)
    perm = np.empty(e, np.int32)
    indptr = np.empty(n_ent + 1, np.int32)
    norm = np.empty(e, np.float32)
    lib.gc_build_half(np.ascontiguousarray(src, np.int32),
                      np.ascontiguousarray(dst, np.int32),
                      e, n_ent, perm, indptr, norm)
    return perm, indptr, norm


def locality_order_native(src: np.ndarray, dst: np.ndarray, n_ent: int
                          ) -> Optional[np.ndarray]:
    """Label-propagation community ordering of the undirected edge list, or
    None if unavailable.  Equality vs the numpy twin is pinned in
    tests/test_partition.py."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gc_locality_order"):
        return None
    order = np.empty(n_ent, np.int32)
    lib.gc_locality_order(np.ascontiguousarray(src, np.int32),
                          np.ascontiguousarray(dst, np.int32),
                          len(src), n_ent, order)
    return order


def group_sr2o_native(triples: np.ndarray, num_relation: int
                      ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Single-pass sr2o grouping over (n, 3) int64 id triples: returns
    (keys first-seen (G,) int64 composite s*2R+r, grouped first-seen-deduped
    values (V,) int32, offsets (G+1,) int64), or None if unavailable.
    Exact equivalent of the numpy group-by in data/dataset.py (tested)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gc_group_sr2o_splits"):
        return None
    tri = np.ascontiguousarray(triples, np.int64)
    h = lib.gc_group_sr2o(tri.reshape(-1), len(tri), num_relation)
    try:
        return _copy_group(lib, h)
    finally:
        lib.gc_group_free(h)


def _copy_group(lib, h) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    g = int(lib.gc_group_n(h))
    v = int(lib.gc_group_nvals(h))
    keys = np.empty(g, np.int64)
    values = np.empty(v, np.int32)
    offsets = np.empty(g + 1, np.int64)
    lib.gc_group_copy(h, keys, values, offsets)
    return keys, values, offsets


def group_sr2o_splits_native(triples: np.ndarray, n_train: int,
                             num_relation: int) -> Optional[Tuple]:
    """One hash pass over all triples returning BOTH groupings the dataset
    build needs: (train-snapshot (keys, values, offsets), all-splits
    (keys, values, offsets)) — the snapshot is the grouping as of the first
    ``n_train`` triples (reference data_loader.py:88-90). None if
    unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gc_group_sr2o_splits"):
        return None
    tri = np.ascontiguousarray(triples, np.int64)
    h = lib.gc_group_sr2o_splits(tri.reshape(-1), len(tri), n_train,
                                 num_relation)
    try:
        return (_copy_group(lib, lib.gc_group2_get(h, 0)),
                _copy_group(lib, lib.gc_group2_get(h, 1)))
    finally:
        lib.gc_group2_free(h)
