"""Locality-aware entity partitioning (``--partition locality``).

The multi-chip schedules shard entities as CONTIGUOUS id ranges
(parallel/boundary.py, parallel/edge_parallel.py), so the entity NUMBERING
decides how many edges cross shards.  Real KG corpora number entities in
first-seen file order (reference data_loader.py:64-74) — essentially random
with respect to graph structure — which makes every row a boundary row.
This module renumbers entities by deterministic label-propagation
communities of the undirected train graph: community members get contiguous
ids, contiguous ranges become well-clustered shards, and the boundary
exchange volume drops by the graph's community structure (measured in
tests/test_partition.py and scripts/boundary_report.py; on structureless
uniform-random graphs the ordering is a no-op by design — locality cannot
be created, only recovered).

The relabeling is an isomorphism: entity NAMES keep their meaning
(``entity2id`` is rebuilt through the permutation), all splits' triples are
remapped, and the dataset is rebuilt through the standard (tested)
pipeline, so training/eval/serving results are identical in distribution —
only the internal numbering changes.  A checkpoint trained under a
partition must be restored under the same one; the CLI records the flag in
params.json and adopts it on restore like the architecture shape fields.

The ordering itself runs in C++ (native/graphcore.cpp gc_locality_order)
with the numpy twin below as fallback; equality between the two is pinned
by tests.
"""

from __future__ import annotations

import numpy as np

from kgc_gcn_tpu.data.dataset import KGDataset, build_dataset_from_ids

PARTITIONS = ("contiguous", "locality")


def _locality_order_numpy(src: np.ndarray, dst: np.ndarray,
                          n_ent: int) -> np.ndarray:
    """Numpy twin of gc_locality_order: deterministic asynchronous label
    propagation (sequential id-order sweeps, most-frequent neighbor label,
    ties to the smallest, <= 10 iterations), then communities emitted
    contiguously by (size desc, label asc), vertices by id.  LPA rather
    than BFS: BFS cannot recover clusters through cross-edge noise."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    deg = np.bincount(src, minlength=n_ent) + np.bincount(dst, minlength=n_ent)
    indptr = np.zeros(n_ent + 1, np.int64)
    indptr[1:] = np.cumsum(deg)
    # CSR adjacency via one stable argsort of the concatenated endpoints
    ends = np.concatenate([src, dst])
    peers = np.concatenate([dst, src])
    adj = peers[np.argsort(ends, kind="stable")]

    label = np.arange(n_ent, dtype=np.int64)
    for _ in range(10):
        changed = False
        for v in range(n_ent):
            nb = adj[indptr[v]: indptr[v + 1]]
            if not len(nb):
                continue
            vals, cnts = np.unique(label[nb], return_counts=True)
            best = vals[np.argmax(cnts)]   # vals sorted: first max = smallest
            if best != label[v]:
                label[v] = best
                changed = True
        if not changed:
            break
    csize = np.bincount(label, minlength=n_ent)
    order = np.lexsort((np.arange(n_ent), label, -csize[label]))
    return order.astype(np.int32)


def locality_order(train_triples: np.ndarray, n_ent: int,
                   use_native: bool = True) -> np.ndarray:
    """(n_ent,) int32 community ordering: ``order[k]`` = old id of new
    id ``k``."""
    tri = np.asarray(train_triples)
    src, dst = tri[:, 0].astype(np.int32), tri[:, 2].astype(np.int32)
    if use_native:
        from kgc_gcn_tpu.utils.native import locality_order_native
        order = locality_order_native(src, dst, n_ent)
        if order is not None:
            return order
        import logging
        logging.warning(
            "native graphcore unavailable — computing the locality order "
            "with the pure-Python twin (O(sweeps x N) loop; minutes to "
            "hours at production scale). Build native/libgraphcore.so "
            "(any g++) for the fast path.")
    return _locality_order_numpy(src, dst, n_ent)


def apply_partition(ds: KGDataset, order: np.ndarray,
                    use_native: bool = True) -> KGDataset:
    """Rebuild the dataset with entities renumbered by ``order`` (an
    isomorphic relabeling — names keep their meaning via entity2id)."""
    n = ds.num_entity
    assert len(order) == n
    new_of_old = np.empty(n, np.int64)
    new_of_old[np.asarray(order, np.int64)] = np.arange(n, dtype=np.int64)

    def remap(tri: np.ndarray) -> np.ndarray:
        tri = np.asarray(tri, np.int64).copy()
        if len(tri):
            tri[:, 0] = new_of_old[tri[:, 0]]
            tri[:, 2] = new_of_old[tri[:, 2]]
        return tri

    ids = {"train": remap(ds.train_triples),
           "valid": remap(ds.valid_triples),
           "test": remap(ds.test_triples)}
    entity2id = {name: int(new_of_old[i]) for name, i in ds.entity2id.items()}
    return build_dataset_from_ids(ds.name, entity2id, dict(ds.relation2id),
                                  ids, use_native=use_native)


def partition_dataset(ds: KGDataset, partition: str,
                      use_native: bool = True) -> KGDataset:
    """Dispatch on the ``--partition`` flag value."""
    if partition not in PARTITIONS:
        raise ValueError(f"unknown partition {partition!r}; "
                         f"valid: {PARTITIONS}")
    if partition == "contiguous" or ds.num_entity == 0:
        return ds   # file first-seen numbering (the reference's order)
    return apply_partition(
        ds, locality_order(ds.train_triples, ds.num_entity, use_native),
        use_native)
