"""Locality entity partitioning (data/partition.py): C++/numpy ordering
equality, the relabeling isomorphism (permuted parameters => identical eval
metrics on the relabeled corpus), and the payoff — boundary exchange volume
shrinks on clustered graphs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.data.partition import (
    _locality_order_numpy, apply_partition, locality_order)


def _rand_triples(rng, n_ent, n_rel, n_edge):
    return np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge)], axis=1).astype(np.int64)


@pytest.mark.parametrize("seed,n_ent,n_edge", [(0, 50, 120), (1, 257, 800),
                                               (2, 64, 5)])
def test_native_order_matches_numpy(seed, n_ent, n_edge):
    """gc_locality_order == the numpy twin, including isolated vertices
    (n_edge=5 on 64 entities leaves most isolated)."""
    from kgc_gcn_tpu.utils.native import locality_order_native
    rng = np.random.default_rng(seed)
    tri = _rand_triples(rng, n_ent, 3, n_edge)
    src, dst = tri[:, 0].astype(np.int32), tri[:, 2].astype(np.int32)
    nat = locality_order_native(src, dst, n_ent)
    if nat is None:
        pytest.skip("native graphcore unavailable")
    ref = _locality_order_numpy(src, dst, n_ent)
    np.testing.assert_array_equal(nat, ref)
    # a permutation of [0, n_ent)
    assert np.array_equal(np.sort(nat), np.arange(n_ent))


def test_order_clusters_components():
    """Entities of one connected component occupy CONTIGUOUS positions in
    the ordering (label propagation converges to one label per chain and
    communities are emitted contiguously)."""
    # two disjoint chains with interleaved ids
    src = np.array([0, 2, 4, 1, 3, 5], np.int32)   # evens chain, odds chain
    dst = np.array([2, 4, 6, 3, 5, 7], np.int32)
    order = _locality_order_numpy(src, dst, 8)
    pos = np.empty(8, int)
    pos[order] = np.arange(8)
    evens, odds = pos[[0, 2, 4, 6]], pos[[1, 3, 5, 7]]
    assert max(evens) - min(evens) == 3
    assert max(odds) - min(odds) == 3


def test_relabel_is_isomorphic_for_eval(toy, toy_cfg):
    """Permuting the entity-indexed parameter rows by the partition order
    and evaluating on the relabeled corpus gives IDENTICAL filtered-rank
    metrics (eval is deterministic; only gather/sum order changes)."""
    from kgc_gcn_tpu.data.batching import make_banks
    from kgc_gcn_tpu.data.graph import (
        build_graph, edge_table_from_reference_order,
        edge_table_to_reference_order)
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer

    ds, g, banks = toy
    cfg = toy_cfg.replace(num_filter=2)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(7))
    r1 = Trainer(cfg, model, g, banks).evaluate(params, state, "valid")

    order = locality_order(ds.train_triples, ds.num_entity)
    ds2 = apply_partition(ds, order)
    # same corpus, new numbering: counts unchanged, names map consistently
    assert ds2.num_entity == ds.num_entity
    assert ds2.num_edge == ds.num_edge
    inv = {v: k for k, v in ds.entity2id.items()}
    new_of_old = np.empty(ds.num_entity, np.int64)
    new_of_old[order] = np.arange(ds.num_entity)
    for name, old in ds.entity2id.items():
        assert ds2.entity2id[name] == new_of_old[old]
    g2 = build_graph(ds2.train_triples, ds2.num_entity, ds2.num_relation,
                     pad_to=int(g.e_pad))
    assert g2.e_pad == g.e_pad

    # permute entity-indexed rows: new row k <- old row order[k]; per-edge
    # tables route through reference edge numbering (triple order, which the
    # relabel preserves)
    import dataclasses
    emb = np.asarray(params.entity_embedding)[order]
    bias = np.asarray(params.decoder.ent_bias)[order]
    tab = edge_table_from_reference_order(
        edge_table_to_reference_order(np.asarray(params.edge_embeddings), g),
        g2)
    params2 = dataclasses.replace(
        params, entity_embedding=jnp.asarray(emb),
        edge_embeddings=jnp.asarray(tab),
        decoder=dataclasses.replace(params.decoder,
                                    ent_bias=jnp.asarray(bias)))
    model2 = build_model(cfg, ds2.num_entity, ds2.num_relation, ds2.num_edge,
                         e_pad=g2.e_pad)
    r2 = Trainer(cfg, model2, g2, make_banks(ds2)).evaluate(
        params2, state, "valid")
    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-4, (k, r1[k], r2[k])
    del inv


def test_locality_shrinks_boundary_volume(eight_devices):
    """The payoff: on a clustered graph with SCRAMBLED ids, the locality
    ordering recovers the clustering and the boundary plan ships a fraction
    of the contiguous-numbering volume."""
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.parallel.boundary import build_boundary_plan

    rng = np.random.default_rng(11)
    n_ent, n_rel, n_edge, G = 512, 4, 8192, 8
    rows_per = n_ent // G
    # planted-partition graph: 90% intra-block edges + 10% noise (the noise
    # is what label propagation handles and plain BFS ordering cannot)
    base = rng.integers(G, size=n_edge) * rows_per
    local = rng.random(n_edge) < 0.9
    s = np.where(local, base + rng.integers(rows_per, size=n_edge),
                 rng.integers(n_ent, size=n_edge))
    o = np.where(local, base + rng.integers(rows_per, size=n_edge),
                 rng.integers(n_ent, size=n_edge))
    tri = np.stack([s, rng.integers(n_rel, size=n_edge), o],
                   axis=1).astype(np.int64)
    # ... with the ids scrambled (what first-seen file order looks like)
    scramble = rng.permutation(n_ent)
    tri_scr = tri.copy()
    tri_scr[:, 0] = scramble[tri[:, 0]]
    tri_scr[:, 2] = scramble[tri[:, 2]]

    def shipped(triples):
        g = build_graph(triples, n_ent, n_rel)
        tot = 0
        for half in (g.inb, g.outb):
            _, st = build_boundary_plan(half, G, n_ent)
            tot += st["in_rows_real_max"] + st["out_rows_real_max"]
        return tot

    order = locality_order(tri_scr, n_ent)
    new_of_old = np.empty(n_ent, np.int64)
    new_of_old[order] = np.arange(n_ent)
    tri_loc = tri_scr.copy()
    tri_loc[:, 0] = new_of_old[tri_scr[:, 0]]
    tri_loc[:, 2] = new_of_old[tri_scr[:, 2]]

    before, after = shipped(tri_scr), shipped(tri_loc)
    assert after < before / 2, (before, after)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]
