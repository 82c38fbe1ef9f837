"""Serving API: encode-once Predictor top-k vs full forward, filtering,
name-level queries, and the TSV file server (kgc_gcn_tpu/serve.py)."""

import json

import jax
import numpy as np
import pytest

from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.serve import Predictor, serve_file


@pytest.fixture(scope="module")
def predictor(toy, toy_cfg):
    ds, graph, _ = toy
    model = build_model(toy_cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=graph.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    return ds, model, params, state, Predictor(
        toy_cfg, model, graph, params, state, ds.entity2id, ds.relation2id)


def test_top_k_matches_full_forward(predictor):
    ds, model, params, state, pred = predictor
    src = np.array([0, 1, 2], np.int32)
    rel = np.array([0, 1, 2], np.int32)
    scores, idx = pred.top_k(src, rel, k=5)

    logits, _ = model.apply(params, state, pred.graph, src, rel, train=False)
    logits = np.asarray(logits)
    for b in range(3):
        order = np.argsort(-logits[b])[:5]
        np.testing.assert_array_equal(idx[b], order)
        np.testing.assert_allclose(scores[b], logits[b][order], rtol=1e-5)


def test_top_k_filtering(predictor):
    ds, model, params, state, pred = predictor
    src = np.array([0], np.int32)
    rel = np.array([0], np.int32)
    _, unfiltered = pred.top_k(src, rel, k=3)
    banned = unfiltered[0][:2].astype(np.int32)             # ban the top 2
    filt = np.full((1, 8), ds.num_entity, np.int32)
    filt[0, :2] = banned
    _, filtered = pred.top_k(src, rel, k=3, filter_idx=filt)
    assert not set(banned).intersection(filtered[0])


def test_score_triples_matches_topk_scores(predictor):
    ds, model, params, state, pred = predictor
    src = np.array([1, 2], np.int32)
    rel = np.array([0, 1], np.int32)
    scores, idx = pred.top_k(src, rel, k=1)
    got = pred.score_triples(src, rel, idx[:, 0])
    np.testing.assert_allclose(got, scores[:, 0], rtol=1e-5)


def test_query_names_and_serve_file(predictor, tmp_path):
    ds, model, params, state, pred = predictor
    subject = next(iter(ds.entity2id))
    relation = next(r for r in ds.relation2id if not r.endswith("_reverse"))

    ranked = pred.query_names(subject, relation, k=3)
    assert len(ranked) == 3
    assert all(r["entity"] in ds.entity2id for r in ranked)
    head = pred.query_names(subject, relation, k=3, head=True)
    assert len(head) == 3

    qf = tmp_path / "queries.txt"
    qf.write_text(f"{subject}\t{relation}\n\n{subject}\t{relation}\n")
    lines = serve_file(pred, str(qf), k=2)
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["subject"] == subject and len(rec["topk"]) == 2


def test_serve_file_batched_matches_per_query(predictor, tmp_path):
    """Batched file serving == per-query results, across batch boundaries."""
    ds, model, params, state, pred = predictor
    ents = list(ds.entity2id)
    rels = [r for r in ds.relation2id if not r.endswith("_reverse")]
    qf = tmp_path / "q.txt"
    lines = [f"{ents[i % len(ents)]}\t{rels[i % len(rels)]}" for i in range(7)]
    qf.write_text("\n".join(lines) + "\n")
    got = serve_file(pred, str(qf), k=2, batch_size=3)   # 3 batches, last=1
    assert len(got) == 7
    for i, line in enumerate(got):
        rec = json.loads(line)
        want = pred.query_names(rec["subject"], rec["relation"], k=2)
        assert [e["entity"] for e in rec["topk"]] == [e["entity"] for e in want]


def test_serve_stream(predictor):
    """Streaming mode: one JSON line per query, errors inline, quit stops."""
    from kgc_gcn_tpu.serve import serve_stream
    ds, model, params, state, pred = predictor
    subject = next(iter(ds.entity2id))
    relation = next(r for r in ds.relation2id if not r.endswith("_reverse"))
    lines = [f"{subject} {relation}", "", f"{subject} {relation} head",
             "nosuchentity r0", "onlyonetoken", "quit",
             f"{subject} {relation}"]
    out = list(serve_stream(pred, iter(lines), k=2))
    assert len(out) == 4                      # blank skipped, quit stops
    first = json.loads(out[0])
    assert first["subject"] == subject and len(first["topk"]) == 2
    assert json.loads(out[1])["head"] is True
    assert "error" in json.loads(out[2])
    assert "malformed" in json.loads(out[3])["error"]


def test_export_tables(predictor, tmp_path):
    ds, model, params, state, pred = predictor
    out = pred.export_tables(str(tmp_path / "tables.npz"))
    data = np.load(out, allow_pickle=True)
    assert data["entity_embeddings"].shape[0] == ds.num_entity
    assert data["relation_embeddings"].shape[0] == 2 * ds.num_relation
    assert len(data["entity_names"]) == ds.num_entity
    name0 = data["entity_names"][0]
    assert ds.entity2id[name0] == 0
    np.testing.assert_allclose(data["entity_embeddings"],
                               np.asarray(pred.all_ent))


@pytest.mark.parametrize("family,kw", [
    ("rgcn", dict(num_bases=2)),
    ("rgat", dict(num_heads=4)),
])
def test_predictor_serves_every_family(toy, toy_cfg, family, kw):
    """The encode-once Predictor is family-agnostic: top-k equals the full
    forward for RGCN and RGAT too (the shared model protocol contract)."""
    ds, graph, _ = toy
    cfg = toy_cfg.replace(model=family, decoder="distmult", **kw)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=graph.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    pred = Predictor(cfg, model, graph, params, state,
                     ds.entity2id, ds.relation2id)
    src = np.array([0, 3], np.int32)
    rel = np.array([1, 0], np.int32)
    scores, idx = pred.top_k(src, rel, k=4)
    logits, _ = model.apply(params, state, pred.graph, src, rel, train=False)
    logits = np.asarray(logits)
    for b in range(2):
        order = np.argsort(-logits[b])[:4]
        np.testing.assert_array_equal(np.asarray(idx)[b], order)
        np.testing.assert_allclose(np.asarray(scores)[b], logits[b][order],
                                   rtol=1e-5)
