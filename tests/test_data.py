"""Data-layer unit tests: vocab, reverse relations, sr2o, graph build, norms,
label construction (SURVEY.md §4 test strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.data.batching import build_labels, epoch_batches, make_query_bank
from kgc_gcn_tpu.data.dataset import build_dataset
from kgc_gcn_tpu.data.graph import build_graph, _reference_norm


TRAIN = [("a", "r1", "b"), ("a", "r1", "c"), ("b", "r2", "c"), ("c", "r1", "a")]
VALID = [("a", "r2", "b")]
TEST = [("b", "r1", "a")]


@pytest.fixture(scope="module")
def ds():
    return build_dataset("mini", TRAIN, VALID, TEST)


def test_vocab_first_seen_order(ds):
    # entities in first-seen order over train, then valid, then test
    assert ds.entity2id == {"a": 0, "b": 1, "c": 2}
    # relations + reverse ids R..2R-1 (reference data_loader.py:73-74)
    assert ds.relation2id["r1"] == 0 and ds.relation2id["r2"] == 1
    assert ds.relation2id["r1_reverse"] == 2
    assert ds.num_relation == 2 and ds.num_entity == 3
    assert ds.num_edge == 4


def test_train_queries_are_deduped_sr_pairs(ds):
    # unique (s, r) incl. reverse; (a, r1) has TWO objects in one query
    q = {tuple(x) for x in ds.train_queries.tolist()}
    assert (0, 0) in q            # (a, r1)
    assert (1, 2) in q            # (b, r1_reverse)
    labels = dict(zip(map(tuple, ds.train_queries.tolist()), ds.train_labels))
    assert sorted(labels[(0, 0)]) == [1, 2]          # a-r1-> b, c
    # train labels use the TRAIN-ONLY sr2o snapshot: (a, r2) appears only in
    # valid, so it must NOT be a train query (no leak from eval splits)
    assert (0, 1) not in labels
    assert labels[(1, 1)] == [2]      # (b, r2) -> {c} from train


def test_eval_queries_and_filter_labels(ds):
    vt = ds.eval_queries["valid_tail"]
    assert vt.triples.tolist() == [[0, 1, 1]]            # (a, r2, b)
    # filter labels come from ALL splits; (a, r2) appears only in valid -> {b}
    assert sorted(vt.labels[0]) == [1]
    # (b, r2) is in train -> test filter for (b, r2) style pairs includes both
    th = ds.eval_queries["test_head"]
    assert th.triples.tolist() == [[0, 2, 1]]            # (a, r1_rev, b)
    assert sorted(th.labels[0]) == [2, 1] or sorted(th.labels[0]) == [1, 2]
    vh = ds.eval_queries["valid_head"]
    assert vh.triples.tolist() == [[1, 3, 0]]            # (b, r2_reverse, a)


def test_reference_norm_formula():
    # degree over ROW occurrences only, indexed at both ends (model.py:72-80)
    row = np.array([0, 0, 1])
    col = np.array([1, 2, 2])
    norm = _reference_norm(row, col, 3)
    deg = np.array([2.0, 1.0, 0.0])
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    np.testing.assert_allclose(norm, dinv[row] * dinv[col], rtol=1e-6)


def test_graph_halves(ds):
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation, pad_to=4)
    assert g.n_edge == 4 and g.e_pad == 4
    # in half: original orientation, CSR-sorted by dst
    assert np.all(np.diff(np.asarray(g.inb.dst)) >= 0)
    assert np.all(np.diff(np.asarray(g.outb.dst)) >= 0)
    # out half: reversed with rel + R, eid + E
    in_set = set(zip(np.asarray(g.inb.src).tolist(),
                     np.asarray(g.inb.rel).tolist(),
                     np.asarray(g.inb.dst).tolist(),
                     np.asarray(g.inb.eid).tolist()))
    assert (0, 0, 1, 0) in in_set                        # a-r1->b, eid 0
    out_set = set(zip(np.asarray(g.outb.src).tolist(),
                      np.asarray(g.outb.rel).tolist(),
                      np.asarray(g.outb.dst).tolist(),
                      np.asarray(g.outb.eid).tolist()))
    assert (1, 2, 0, 4) in out_set                       # b-r1_rev->a, eid E+0
    # indptr is a valid CSR over dst
    indptr = np.asarray(g.inb.indptr)
    assert indptr[0] == 0 and indptr[-1] == g.e_pad


def test_graph_padding_zero_norm(ds):
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation, pad_to=16)
    assert g.e_pad == 16
    np.testing.assert_array_equal(np.asarray(g.inb.norm[4:]), 0.0)


def test_build_labels_smoothing(ds):
    bank = make_query_bank(ds.train_queries, ds.train_labels, ds.num_entity)
    y = np.asarray(build_labels(bank.label_idx[:2], ds.num_entity, 0.1))
    n = ds.num_entity
    # y = (1 - eps) * multihot + 1/N (reference data_loader.py:41-43)
    expected_hi = 0.9 + 1.0 / n
    expected_lo = 1.0 / n
    close_hi = np.isclose(y, expected_hi, atol=1e-6)
    close_lo = np.isclose(y, expected_lo, atol=1e-6)
    assert np.all(close_hi | close_lo)
    # each row has the right number of positives
    for i in range(2):
        n_pos = len(ds.train_labels[i])
        assert int((y[i] > 0.5).sum()) == n_pos


def test_epoch_batches_mask_and_coverage():
    rng = np.random.default_rng(0)
    idx, mask = epoch_batches(10, 4, rng)
    assert idx.shape == (3, 4) and mask.shape == (3, 4)
    assert mask.sum() == 10
    covered = sorted(idx.ravel()[mask.ravel() > 0].tolist())
    assert covered == list(range(10))


def test_fast_query_build_equals_dict_oracle():
    """The vectorized first-seen group-by (build_dataset_from_ids fast path)
    reproduces the reference-literal dict build EXACTLY: query order
    (first-seen), label order (first-seen, deduped), eval filter labels,
    and the padded label matrices."""
    from kgc_gcn_tpu.data.dataset import build_dataset_from_ids, LabelSet
    from kgc_gcn_tpu.data.batching import _pad_labels

    rng = np.random.default_rng(7)
    n_ent, n_rel = 23, 5
    ids = {}
    for split, n in (("train", 240), ("valid", 60), ("test", 50)):
        tri = rng.integers(0, [n_ent, n_rel, n_ent], size=(n, 3)).astype(np.int64)
        # force duplicates (exercise the first-seen dedup) and shared (s, r)
        tri[n // 2:] = tri[: n - n // 2]
        ids[split] = tri
    e2i = {f"e{i}": i for i in range(n_ent)}
    r2i = {f"r{i}": i for i in range(n_rel)}
    r2i.update({f"r{i}_reverse": i + n_rel for i in range(n_rel)})

    fast = build_dataset_from_ids("x", e2i, r2i, ids, use_fast=True)
    slow = build_dataset_from_ids("x", e2i, r2i, ids, use_fast=False)

    assert isinstance(fast.train_labels, LabelSet)
    np.testing.assert_array_equal(fast.train_queries, slow.train_queries)
    assert list(fast.train_labels) == list(slow.train_labels)
    np.testing.assert_array_equal(
        _pad_labels(fast.train_labels, n_ent),
        _pad_labels(slow.train_labels, n_ent))
    for key in fast.eval_queries:
        fq, sq = fast.eval_queries[key], slow.eval_queries[key]
        np.testing.assert_array_equal(fq.triples, sq.triples)
        assert list(fq.labels) == list(sq.labels), key
        np.testing.assert_array_equal(
            _pad_labels(fq.labels, n_ent), _pad_labels(sq.labels, n_ent))


def test_labelset_sequence_protocol():
    from kgc_gcn_tpu.data.dataset import LabelSet

    ls = LabelSet(np.asarray([3, 1, 4, 1, 5], np.int32),
                  np.asarray([0, 2, 2, 5], np.int64))
    assert len(ls) == 3
    assert ls[0] == [3, 1] and ls[1] == [] and ls[2] == [4, 1, 5]
    assert ls[-1] == [4, 1, 5]
    assert list(ls) == [[3, 1], [], [4, 1, 5]]
    assert ls[1:] == [[], [4, 1, 5]]
