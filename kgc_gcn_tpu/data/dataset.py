"""Knowledge-graph corpus: vocab, triples, and query materialization.

Pure-numpy host-side layer (the device-facing arrays are produced by
``kgc_gcn_tpu.data.graph`` and ``kgc_gcn_tpu.data.batching``).

Reference behavior replicated (reference data_loader.py:54-120):
  * entity/relation vocab is built over ALL splits in first-seen order
    (data_loader.py:64-74); names are lowercased.  The reference lowercases
    only at vocab build and not at triple lookup (data_loader.py:67 vs 85-86),
    which crashes on mixed-case data; we lowercase at both sites, which is
    behavior-identical on every dataset the reference can actually load.
  * reverse relations get ids ``R..2R-1`` (data_loader.py:73-74).
  * ``sr2o`` maps: a train-only snapshot (training labels) and an all-splits
    map (filtered-eval labels) (data_loader.py:80-94).
  * train queries are DEDUPLICATED (s, r) pairs — including reverse queries
    (o, r+R) — each with the multi-label set of true objects
    (data_loader.py:100-102); NOT one example per triple.
  * valid/test queries are per-triple: tail query (s, r, o) and head query
    (o, r+R, s), with all-splits filter labels (data_loader.py:104-110).

An optional C++ parser (kgc_gcn_tpu.utils.native) accelerates the text scan
for large corpora; the numpy path is the reference implementation.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

SPLITS = ("train", "valid", "test")


@dataclass
class EvalQueries:
    """Per-triple eval queries for one split+direction."""

    triples: np.ndarray       # int32 (Q, 3) — (src, rel, obj)
    labels: List[List[int]]   # filter label sets (all-splits sr2o)


@dataclass
class KGDataset:
    name: str
    entity2id: Dict[str, int]
    relation2id: Dict[str, int]          # includes '<rel>_reverse' ids R..2R-1
    num_entity: int
    num_relation: int                    # R (forward only); model uses 2R
    num_edge: int                        # E = number of train triples
    train_triples: np.ndarray            # int64 (E, 3)
    valid_triples: np.ndarray
    test_triples: np.ndarray
    train_queries: np.ndarray            # int32 (Q, 2) — unique (s, r) incl. reverse
    train_labels: List[List[int]]        # true objects per train query (train-only sr2o)
    eval_queries: Dict[str, EvalQueries] = field(default_factory=dict)
    # keys: valid_tail, valid_head, test_tail, test_head

    @property
    def num_train_queries(self) -> int:
        return len(self.train_queries)


def _read_triples(path: str) -> List[Tuple[str, str, str]]:
    out = []
    with open(path, "r") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if len(parts) != 3:
                raise ValueError(f"{path}: malformed line {line!r}")
            out.append((parts[0].lower(), parts[1].lower(), parts[2].lower()))
    return out


def load_dataset(name: str, data_dir: str = "data",
                 use_native: bool = True) -> KGDataset:
    """Load ``<data_dir>/<name>/{train,valid,test}.txt`` TSV triple files.

    Uses the C++ graphcore parser (kgc_gcn_tpu.utils.native) when available —
    identical vocab order/lowercasing — and falls back to pure Python.
    """
    root = os.path.join(data_dir, name)
    paths = {s: os.path.join(root, s + ".txt") for s in SPLITS}
    if use_native:
        from kgc_gcn_tpu.utils.native import load_corpus_native
        res = load_corpus_native(paths["train"], paths["valid"], paths["test"])
        if res is not None:
            entity2id, rel_fwd, triples = res
            relation2id = dict(rel_fwd)
            relation2id.update({r + "_reverse": i + len(rel_fwd)
                                for r, i in rel_fwd.items()})
            return build_dataset_from_ids(name, entity2id, relation2id,
                                          triples)
    raw = {s: _read_triples(paths[s]) for s in SPLITS}
    return build_dataset(name, raw["train"], raw["valid"], raw["test"])


def build_dataset(
    name: str,
    train: Sequence[Tuple[str, str, str]],
    valid: Sequence[Tuple[str, str, str]],
    test: Sequence[Tuple[str, str, str]],
) -> KGDataset:
    raw = {"train": list(train), "valid": list(valid), "test": list(test)}

    # vocab in first-seen order over all splits (reference data_loader.py:64-74)
    entity2id: Dict[str, int] = {}
    relation2id: Dict[str, int] = {}
    for split in SPLITS:
        for s, r, o in raw[split]:
            if s not in entity2id:
                entity2id[s] = len(entity2id)
            if r not in relation2id:
                relation2id[r] = len(relation2id)
            if o not in entity2id:
                entity2id[o] = len(entity2id)
    num_relation = len(relation2id)
    for r in list(relation2id.keys()):
        relation2id[r + "_reverse"] = relation2id[r] + num_relation

    ids = {}
    for split in SPLITS:
        tri = np.empty((len(raw[split]), 3), dtype=np.int64)
        for i, (s, r, o) in enumerate(raw[split]):
            tri[i] = (entity2id[s], relation2id[r], entity2id[o])
        ids[split] = tri
    return build_dataset_from_ids(name, entity2id, relation2id, ids)


def build_dataset_from_ids(
    name: str,
    entity2id: Dict[str, int],
    relation2id: Dict[str, int],     # incl. '<rel>_reverse' ids R..2R-1
    ids: Dict[str, np.ndarray],      # {split: (n, 3) int64 id triples}
) -> KGDataset:
    num_entity = len(entity2id)
    num_relation = len(relation2id) // 2

    # sr2o maps (reference data_loader.py:80-96)
    sr2o: Dict[Tuple[int, int], dict] = {}
    sr2o_train: Dict[Tuple[int, int], List[int]] = {}

    for split in SPLITS:
        for sub, rel, obj in ids[split].tolist():
            sr2o.setdefault((sub, rel), {})[obj] = None
            sr2o.setdefault((obj, rel + num_relation), {})[sub] = None
        if split == "train":
            sr2o_train = {k: list(v) for k, v in sr2o.items()}
    sr2o_all = {k: list(v) for k, v in sr2o.items()}

    # train queries: deduped (s, r) -> multi-label (reference data_loader.py:100-102)
    tq = np.array(list(sr2o_train.keys()), dtype=np.int32).reshape(-1, 2)
    tl = [sr2o_train[(int(s), int(r))] for s, r in tq]

    # eval queries (reference data_loader.py:104-110)
    eval_queries = {}
    for split in ("valid", "test"):
        tri = ids[split]
        tail = np.stack(
            [tri[:, 0], tri[:, 1], tri[:, 2]], axis=1).astype(np.int32)
        head = np.stack(
            [tri[:, 2], tri[:, 1] + num_relation, tri[:, 0]], axis=1).astype(np.int32)
        eval_queries[f"{split}_tail"] = EvalQueries(
            tail, [sr2o_all[(int(s), int(r))] for s, r, _ in tail])
        eval_queries[f"{split}_head"] = EvalQueries(
            head, [sr2o_all[(int(s), int(r))] for s, r, _ in head])

    ds = KGDataset(
        name=name,
        entity2id=entity2id,
        relation2id=relation2id,
        num_entity=num_entity,
        num_relation=num_relation,
        num_edge=len(ids["train"]),
        train_triples=ids["train"],
        valid_triples=ids["valid"],
        test_triples=ids["test"],
        train_queries=tq,
        train_labels=tl,
        eval_queries=eval_queries,
    )
    logging.info(
        "entity=%d, relation=%d, train_triplets=%d, valid_triplets=%d, test_triplets=%d",
        ds.num_entity, ds.num_relation, len(ds.train_triples),
        len(ds.valid_triples), len(ds.test_triples))
    return ds
