"""Native C++ graphcore parity: parser/vocab vs the pure-Python path, and the
CSR half-builder vs numpy."""

import numpy as np
import pytest

from kgc_gcn_tpu.data.dataset import load_dataset
from kgc_gcn_tpu.data.toy import write_toy
from kgc_gcn_tpu.utils.native import build_half_native, get_lib


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="graphcore.so unavailable (no g++)")


@needs_native
def test_native_corpus_matches_python(tmp_path):
    write_toy(str(tmp_path), n_ent=15, n_rel=5, n_train=60)
    a = load_dataset("Toy", str(tmp_path), use_native=True)
    b = load_dataset("Toy", str(tmp_path), use_native=False)
    assert a.entity2id == b.entity2id
    assert a.relation2id == b.relation2id
    for s in ("train", "valid", "test"):
        np.testing.assert_array_equal(getattr(a, f"{s}_triples"),
                                      getattr(b, f"{s}_triples"))
    np.testing.assert_array_equal(a.train_queries, b.train_queries)
    assert a.train_labels == b.train_labels
    for k in a.eval_queries:
        np.testing.assert_array_equal(a.eval_queries[k].triples,
                                      b.eval_queries[k].triples)
        assert a.eval_queries[k].labels == b.eval_queries[k].labels


@needs_native
def test_native_build_half_matches_numpy():
    from kgc_gcn_tpu.data.graph import _reference_norm
    rng = np.random.default_rng(0)
    n, e = 50, 400
    src = rng.integers(n, size=e).astype(np.int32)
    dst = rng.integers(n, size=e).astype(np.int32)

    perm, indptr, norm = build_half_native(src, dst, n)

    # perm is a stable dst-sort
    np.testing.assert_array_equal(perm, np.argsort(dst, kind="stable"))
    # indptr is the CSR pointer of sorted dst
    counts = np.bincount(dst, minlength=n)
    np.testing.assert_array_equal(indptr,
                                  np.concatenate([[0], np.cumsum(counts)]))
    # norm matches the reference formula (unsorted edge order)
    np.testing.assert_allclose(norm, _reference_norm(src, dst, n),
                               rtol=1e-6, atol=1e-7)


@needs_native
def test_build_graph_native_matches_python():
    """The PRODUCT graph build (which routes norms/sort/CSR through
    gc_build_half when the library is available) == the pure-numpy path,
    every array of every half and the stacked view."""
    import jax
    from kgc_gcn_tpu.data.graph import build_graph

    rng = np.random.default_rng(4)
    tri = np.stack([rng.integers(30, size=300), rng.integers(5, size=300),
                    rng.integers(30, size=300)], axis=1).astype(np.int64)
    a = build_graph(tri, 30, 5, pad_to=8, use_native=True)
    b = build_graph(tri, 30, 5, pad_to=8, use_native=False)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        la, lb = np.asarray(la), np.asarray(lb)
        if la.dtype.kind == "f":   # norms: C++ rsqrt rounds at ulp level
            np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)
        else:
            np.testing.assert_array_equal(la, lb)


@needs_native
def test_native_malformed_line_raises(tmp_path):
    root = tmp_path / "Bad"
    root.mkdir()
    for s in ("train", "valid", "test"):
        (root / f"{s}.txt").write_text("a r b\n")
    (root / "train.txt").write_text("a r\n")
    with pytest.raises(ValueError, match="malformed"):
        load_dataset("Bad", str(tmp_path), use_native=True)
