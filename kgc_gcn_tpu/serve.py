"""Serving / inference: encode once, answer link-prediction queries.

The reference has no deployment story — its only inference surface is the
metric-producing ``predict`` loop that re-encodes the whole graph for every
batch (reference main.py:105-135).  For serving, the encoder output is
static once training ends, so a ``Predictor``:

  * runs the full-graph encoder ONCE (eval mode) and caches ``all_ent`` /
    ``all_rel`` on device;
  * answers queries with a single jitted decoder pass + ``lax.top_k`` —
    a (B, d) x (d, N) MXU matmul per batch, no message passing;
  * optionally filters known-true objects (the filtered-ranking convention)
    via a padded per-query index list;
  * maps entity/relation NAMES through the dataset vocab, including the
    ``<rel>_reverse`` ids for head prediction (reference data_loader.py:73-74).

``kgc_gcn_tpu.cli --do_predict --predict_file queries.txt`` serves a TSV of
``subject<TAB>relation`` lines from a trained checkpoint, printing one JSON
line per query with the top-K entities and scores.
"""

from __future__ import annotations

import functools
import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kgc_gcn_tpu.config import Config
from kgc_gcn_tpu.data.graph import Graph


class Predictor:
    """Encode-once link-prediction server for one trained model."""

    def __init__(self, cfg: Config, model, graph: Graph, params, state,
                 entity2id: Optional[Dict[str, int]] = None,
                 relation2id: Optional[Dict[str, int]] = None):
        self.cfg = cfg
        self.model = model
        self.graph = graph
        self.params = params
        self.state = state
        self.entity2id = entity2id or {}
        self.relation2id = relation2id or {}
        self.id2entity = {v: k for k, v in self.entity2id.items()}
        all_ent, all_rel, _ = model.encode(params, state, graph, train=False)
        # cache the encoded tables on device; serving never re-encodes
        self.all_ent = jax.block_until_ready(all_ent)
        self.all_rel = all_rel

        @functools.partial(jax.jit, static_argnames=("k",))
        def _topk(src, rel, filter_idx, k):
            logits, _ = model.decode(
                params, state, self.all_ent, self.all_rel, src, rel,
                train=False)
            rows = jnp.arange(logits.shape[0])
            logits = logits.at[rows[:, None], filter_idx].set(
                -jnp.inf, mode="drop")
            return jax.lax.top_k(logits, k)

        self._topk = _topk

    # ---------------------------------------------------------------- queries

    def top_k(
        self,
        src: np.ndarray,                  # int (B,) entity ids
        rel: np.ndarray,                  # int (B,) relation ids (use r + R
                                          #   for head prediction)
        k: int = 10,
        filter_idx: Optional[np.ndarray] = None,   # (B, L) ids to exclude,
                                                   #   padded with n_ent
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (B, k), entity ids (B, k)) for the top-k objects."""
        b = len(src)
        if filter_idx is None:
            filter_idx = np.full((b, 1), self.graph.n_ent, np.int32)
        scores, idx = self._topk(
            jnp.asarray(src, jnp.int32), jnp.asarray(rel, jnp.int32),
            jnp.asarray(filter_idx, jnp.int32), k)
        return np.asarray(scores), np.asarray(idx)

    def score_triples(self, src, rel, obj) -> np.ndarray:
        """Scores of explicit (s, r, o) triples, (B,)."""
        logits, _ = self.model.decode(
            self.params, self.state, self.all_ent, self.all_rel,
            jnp.asarray(src, jnp.int32), jnp.asarray(rel, jnp.int32),
            train=False)
        return np.asarray(logits[jnp.arange(len(src)), jnp.asarray(obj)])

    def export_tables(self, path: str) -> str:
        """Write the encoded entity/relation tables (+ vocab) to ``path`` as
        an .npz — the deployable artifact for downstream retrieval systems
        that only need embeddings, not the encoder."""
        ents = np.empty(len(self.entity2id), dtype=object)
        for name, i in self.entity2id.items():
            ents[i] = name
        rels = np.empty(len(self.relation2id), dtype=object)
        for name, i in self.relation2id.items():
            rels[i] = name
        np.savez(
            path,
            entity_embeddings=np.asarray(self.all_ent),
            relation_embeddings=np.asarray(self.all_rel),
            entity_bias=np.asarray(self.params.decoder.ent_bias)
            if hasattr(self.params.decoder, "ent_bias") else np.zeros(0),
            entity_names=ents, relation_names=rels)
        return path

    # ------------------------------------------------------------ name-level

    def ent_id(self, name: str) -> int:
        try:
            return self.entity2id[name.lower()]
        except KeyError:
            raise KeyError(f"unknown entity {name!r} (vocab has "
                           f"{len(self.entity2id)} entities)") from None

    def rel_id(self, name: str) -> int:
        try:
            return self.relation2id[name.lower()]
        except KeyError:
            raise KeyError(
                f"unknown relation {name!r} (vocab: "
                f"{sorted(self.relation2id)[:10]}...)") from None

    def query_names(self, subject: str, relation: str, k: int = 10,
                    head: bool = False) -> List[Dict]:
        """Top-k object (or subject, ``head=True``) names for a name query.

        Head prediction uses the reverse-relation id ``r + R`` exactly as the
        eval pipeline does (reference data_loader.py:104-110)."""
        s = self.ent_id(subject)
        r = self.rel_id(relation)
        if head:
            r += self.graph.n_rel
        scores, idx = self.top_k(np.array([s]), np.array([r]), k)
        return [
            {"entity": self.id2entity.get(int(e), str(int(e))),
             "score": float(v)}
            for v, e in zip(scores[0], idx[0])
        ]


def serve_stream(predictor: Predictor, stream, k: int = 10):
    """Interactive/streaming serving: one ``subject relation [head]`` query
    per input line, one JSON line yielded per query (errors come back as
    ``{"error": ...}`` lines instead of killing the stream).  The CLI wires
    stdin here via ``--predict_file -``; batch shape is 1 and compiles once.
    """
    for line in stream:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0].lower() in ("quit", "exit"):
            return
        if len(parts) < 2:
            yield json.dumps({"error": f"malformed query line {line!r} "
                                       "(want: subject relation [head])"})
            continue
        head = len(parts) > 2 and parts[2].lower() == "head"
        try:
            yield json.dumps({
                "subject": parts[0].lower(), "relation": parts[1].lower(),
                "head": head,
                "topk": predictor.query_names(parts[0], parts[1], k=k,
                                              head=head)})
        except KeyError as e:
            # e.args[0] is the message; str(KeyError) adds quoting
            yield json.dumps({"error": str(e.args[0]) if e.args else str(e)})
        except Exception as e:   # keep the long-running stream alive
            yield json.dumps({"error": f"{type(e).__name__}: {e}"})


def serve_file(predictor: Predictor, path: str, k: int = 10,
               batch_size: int = 128) -> List[str]:
    """Serve a TSV of ``subject<TAB>relation`` queries; returns JSON lines.

    Queries are BATCHED: ``batch_size`` queries share one jitted decoder
    matmul + top_k (per-query dispatch costs ~3 ms through a remote tunnel —
    BENCH_NOTES.md); the final partial batch is padded with query 0 and the
    padding results dropped.
    """
    queries = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if len(parts) < 2:
                raise ValueError(f"{path}: malformed query line {line!r}")
            queries.append((parts[0].lower(), parts[1].lower()))
    if not queries:
        return []

    src = np.array([predictor.ent_id(s) for s, _ in queries], np.int32)
    rel = np.array([predictor.rel_id(r) for _, r in queries], np.int32)
    out = []
    for lo in range(0, len(queries), batch_size):
        s_b, r_b = src[lo:lo + batch_size], rel[lo:lo + batch_size]
        n_real = len(s_b)
        if n_real < batch_size and len(queries) > batch_size:
            pad = batch_size - n_real        # keep ONE compiled batch shape
            s_b = np.concatenate([s_b, np.zeros(pad, np.int32)])
            r_b = np.concatenate([r_b, np.zeros(pad, np.int32)])
        scores, idx = predictor.top_k(s_b, r_b, k=k)
        for q in range(n_real):
            sub, rl = queries[lo + q]
            ranked = [
                {"entity": predictor.id2entity.get(int(e), str(int(e))),
                 "score": float(v)}
                for v, e in zip(scores[q], idx[q])
            ]
            out.append(json.dumps(
                {"subject": sub, "relation": rl, "topk": ranked}))
    return out
