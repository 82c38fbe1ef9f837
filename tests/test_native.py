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


@needs_native
def test_native_sr2o_grouper_matches_numpy():
    """gc_group_sr2o (single hash pass) == the numpy first-seen group-by:
    same key order, same deduped value order, same offsets."""
    from kgc_gcn_tpu.data.dataset import _group_first_seen, _sr_stream
    from kgc_gcn_tpu.utils.native import group_sr2o_native

    rng = np.random.default_rng(11)
    n_ent, n_rel, n = 31, 6, 500
    tri = rng.integers(0, [n_ent, n_rel, n_ent], size=(n, 3)).astype(np.int64)
    tri[n // 3:] = tri[: n - n // 3]           # heavy duplication
    nk, nv, noff = group_sr2o_native(tri, n_rel)
    k, v = _sr_stream({"t": tri}, ("t",), n_rel)
    pk, pv, poff, _ = _group_first_seen(k, v, n_ent)
    np.testing.assert_array_equal(nk, pk)
    np.testing.assert_array_equal(nv, pv)
    np.testing.assert_array_equal(noff, poff)


@needs_native
def test_native_sr2o_grouper_empty():
    from kgc_gcn_tpu.utils.native import group_sr2o_native

    nk, nv, noff = group_sr2o_native(np.empty((0, 3), np.int64), 4)
    assert len(nk) == 0 and len(nv) == 0
    np.testing.assert_array_equal(noff, [0])


@needs_native
def test_dataset_build_engines_agree(tmp_path):
    """All three build engines (native hash grouper, numpy group-by, dict
    oracle) produce identical datasets."""
    from kgc_gcn_tpu.data.dataset import build_dataset_from_ids
    import kgc_gcn_tpu.utils.native as native_mod

    rng = np.random.default_rng(13)
    n_ent, n_rel = 19, 4
    ids = {s: rng.integers(0, [n_ent, n_rel, n_ent],
                           size=(n, 3)).astype(np.int64)
           for s, n in (("train", 150), ("valid", 40), ("test", 30))}
    e2i = {f"e{i}": i for i in range(n_ent)}
    r2i = {f"r{i}": i for i in range(n_rel)}
    r2i.update({f"r{i}_reverse": i + n_rel for i in range(n_rel)})

    via_native = build_dataset_from_ids("x", e2i, r2i, ids)
    via_dict = build_dataset_from_ids("x", e2i, r2i, ids, use_fast=False)
    # numpy path: disable the native grouper for one build
    import unittest.mock as mock
    with mock.patch.object(native_mod, "group_sr2o_native",
                           lambda *a, **k: None):
        via_numpy = build_dataset_from_ids("x", e2i, r2i, ids)

    for a, b in ((via_native, via_dict), (via_numpy, via_dict)):
        np.testing.assert_array_equal(a.train_queries, b.train_queries)
        assert list(a.train_labels) == list(b.train_labels)
        for key in a.eval_queries:
            np.testing.assert_array_equal(a.eval_queries[key].triples,
                                          b.eval_queries[key].triples)
            assert list(a.eval_queries[key].labels) == \
                list(b.eval_queries[key].labels)


@needs_native
def test_native_splits_grouper_matches_separate_calls():
    """gc_group_sr2o_splits (one pass, train snapshot + all) == grouping the
    train prefix and the full stream separately."""
    from kgc_gcn_tpu.utils.native import (group_sr2o_native,
                                          group_sr2o_splits_native)

    rng = np.random.default_rng(17)
    n_ent, n_rel = 29, 5
    tr = rng.integers(0, [n_ent, n_rel, n_ent], size=(120, 3)).astype(np.int64)
    va = rng.integers(0, [n_ent, n_rel, n_ent], size=(30, 3)).astype(np.int64)
    va[:10] = tr[:10]                      # overlap train/valid pairs
    allt = np.concatenate([tr, va])
    (tk, tv, toff), (ak, av, aoff) = group_sr2o_splits_native(
        allt, len(tr), n_rel)
    etk, etv, etoff = group_sr2o_native(tr, n_rel)
    eak, eav, eaoff = group_sr2o_native(allt, n_rel)
    np.testing.assert_array_equal(tk, etk)
    np.testing.assert_array_equal(tv, etv)
    np.testing.assert_array_equal(toff, etoff)
    np.testing.assert_array_equal(ak, eak)
    np.testing.assert_array_equal(av, eav)
    np.testing.assert_array_equal(aoff, eaoff)


def test_use_native_false_disables_native_grouper(tmp_path, monkeypatch):
    """load_dataset(use_native=False) must not call into the .so at all —
    it is the documented escape hatch for a broken native build."""
    import kgc_gcn_tpu.utils.native as native_mod

    def boom(*a, **k):
        raise AssertionError("native grouper called despite use_native=False")

    monkeypatch.setattr(native_mod, "group_sr2o_splits_native", boom)
    monkeypatch.setattr(native_mod, "load_corpus_native", boom)
    write_toy(str(tmp_path), n_ent=9, n_rel=3, n_train=30)
    ds = load_dataset("Toy", str(tmp_path), use_native=False)
    assert ds.num_entity > 0 and len(ds.train_labels) > 0


def test_labelset_rejects_out_of_range():
    from kgc_gcn_tpu.data.dataset import LabelSet

    ls = LabelSet(np.asarray([1, 2], np.int32), np.asarray([0, 2], np.int64))
    with pytest.raises(IndexError):
        ls[1]
    with pytest.raises(IndexError):
        ls[-2]
    assert ls[-1] == [1, 2]
