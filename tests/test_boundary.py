"""Boundary-compressed overlapped entity exchange (parallel/boundary.py):
numerical equality with the plain segment-sum, gradient flow through the
ppermute pipeline, and the COMM-VOLUME accounting — the property that makes
the schedule worth having: the rows a device ships per layer are the
partition's boundary set, strictly less than the N rows the gather/ring
schedules move (SURVEY.md §2.2 row 2, §5.7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.parallel.boundary import (
    build_boundary_plan, make_boundary_aggregate)
from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS, make_mesh, shard_graph


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def _placed_plan(mesh, plan):
    row = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(GRAPH_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, row), plan)


def test_boundary_aggregate_matches_single_device(toy, eight_devices):
    """Compressed exchange == plain segment-sum, both halves, fwd + grads."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half

    ds, g, banks = toy
    rng = np.random.default_rng(31)
    d = 8
    mesh = make_mesh(data=1, graph=8)
    n_pad = -(-ds.num_entity // 8) * 8

    x = rng.normal(size=(ds.num_entity, d)).astype(np.float32)
    xp = np.zeros((n_pad, d), np.float32)
    xp[: ds.num_entity] = x
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))

    with mesh:
        gs = shard_graph(g, mesh)
        row = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(GRAPH_AXIS))
        xs = jax.device_put(xp, row)
        for half_name in ("inb", "outb"):
            half, half_s = getattr(g, half_name), getattr(gs, half_name)
            et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
            plan, stats = build_boundary_plan(half, 8, n_pad)
            agg = make_boundary_aggregate(
                mesh, ds.num_entity, _placed_plan(mesh, plan))
            ets = jax.device_put(et, row)

            out = agg(xs, rel, ets, half_s)
            # output stays row-sharded: 1/8 of the padded rows per device
            assert {s.data.shape for s in out.addressable_shards} \
                == {(n_pad // 8, d)}
            expect = aggregate_half(jnp.asarray(x), rel, et, half,
                                    ds.num_entity)
            np.testing.assert_allclose(
                np.asarray(out)[: ds.num_entity], np.asarray(expect),
                rtol=1e-5, atol=1e-5, err_msg=half_name)

            # gradients flow through the full pipeline (input ppermutes,
            # block segment-sums, output routing) — check d_x and d_etab
            # against the dense schedule's
            def loss_b(xv, etv):
                return jnp.sum(agg(xv, rel, etv, half_s) ** 2)

            def loss_d(xv, etv):
                return jnp.sum(jnp.pad(
                    aggregate_half(xv, rel, etv, half, ds.num_entity),
                    ((0, n_pad - ds.num_entity), (0, 0))) ** 2)

            gb = jax.grad(loss_b, argnums=(0, 1))(xs, ets)
            gd = jax.grad(loss_d, argnums=(0, 1))(jnp.asarray(x), et)
            np.testing.assert_allclose(
                np.asarray(gb[0])[: ds.num_entity], np.asarray(gd[0]),
                rtol=1e-4, atol=1e-5, err_msg=f"{half_name} d_x")
            np.testing.assert_allclose(
                np.asarray(gb[1]), np.asarray(gd[1]),
                rtol=1e-4, atol=1e-5, err_msg=f"{half_name} d_etab")


def test_boundary_comm_volume(eight_devices):
    """The accounting that justifies the schedule: padded rows shipped per
    device per layer (input boundary + output routing) are BELOW the n_pad
    rows the gather schedule's all_gather alone receives — and far below its
    all_gather + psum_scatter total.  Uses a WN18RR-shaped sparse random
    graph (E/N ~ 2, the reference's regime): on the 12-entity toy fixture
    block padding dominates the counts and the accounting is meaningless."""
    from kgc_gcn_tpu.data.graph import build_graph

    rng = np.random.default_rng(7)
    n_ent, n_rel, n_edge = 4096, 11, 8192
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge)], axis=1).astype(np.int64)
    g = build_graph(tri, n_ent, n_rel)
    n_pad = -(-n_ent // 8) * 8
    for half_name in ("inb", "outb"):
        _, stats = build_boundary_plan(getattr(g, half_name), 8, n_pad)
        shipped = stats["in_rows_padded"] + stats["out_rows_padded"]
        assert shipped < stats["n_pad"], (half_name, stats)
        assert shipped < stats["gather_rows"], (half_name, stats)
        # real (unpadded) boundary rows are what the locality partitioner
        # optimizes; sanity: they are bounded by the padded counts
        assert stats["in_rows_real_max"] <= stats["in_rows_padded"] * 8
        assert stats["out_rows_real_max"] <= stats["out_rows_padded"] * 8


def test_boundary_plan_scales_with_boundary_not_n(eight_devices):
    """On a perfectly partitionable graph (edges only within contiguous
    blocks of 8 entities) the boundary sets are EMPTY — the plan must detect
    that and ship zero cross-shard rows, while a random graph of the same
    size ships plenty.  This is the property the locality partitioner
    (data/partition.py) buys on real graphs."""
    from kgc_gcn_tpu.data.graph import build_graph

    rng = np.random.default_rng(5)
    n_ent, n_rel, n_edge = 512, 4, 2048
    rows_per = 512 // 8

    # block-local graph: src and dst always inside the same 64-entity shard
    base = rng.integers(8, size=n_edge) * rows_per
    tri_local = np.stack([
        base + rng.integers(rows_per, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        base + rng.integers(rows_per, size=n_edge)], axis=1).astype(np.int64)
    g_local = build_graph(tri_local, n_ent, n_rel)

    tri_rand = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge)], axis=1).astype(np.int64)
    g_rand = build_graph(tri_rand, n_ent, n_rel)

    # NOTE: edges are partitioned as contiguous slices of the dst-sorted
    # order, which does not align edge ownership with src shards — but on the
    # block-local graph every edge's src shard EQUALS its dst shard, and the
    # dst-sorted slices follow shard order, so cross-shard reads only occur
    # at slice-boundary straddle and padding.  The volumes must be far apart.
    def shipped(g):
        tot = 0
        for half_name in ("inb", "outb"):
            _, st = build_boundary_plan(getattr(g, half_name), 8, 512)
            tot += st["in_rows_real_max"] + st["out_rows_real_max"]
        return tot

    assert shipped(g_local) < shipped(g_rand) / 4, (
        shipped(g_local), shipped(g_rand))


def test_boundary_aggregate_pallas_matches_xla(toy, eight_devices):
    """The kernel path (per-block MXU CSR segment-sum via the plan's
    indptr/src-sorted metadata) == the XLA boundary path == the dense
    schedule, forward and d_x/d_etab/d_rel gradients."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half

    ds, g, banks = toy
    rng = np.random.default_rng(33)
    d = 8
    mesh = make_mesh(data=1, graph=8)
    n_pad = -(-ds.num_entity // 8) * 8

    x = rng.normal(size=(ds.num_entity, d)).astype(np.float32)
    xp = np.zeros((n_pad, d), np.float32)
    xp[: ds.num_entity] = x
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))

    with mesh:
        gs = shard_graph(g, mesh)
        row = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(GRAPH_AXIS))
        xs = jax.device_put(xp, row)
        for half_name in ("inb", "outb"):
            half, half_s = getattr(g, half_name), getattr(gs, half_name)
            et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
            plan, _ = build_boundary_plan(half, 8, n_pad)
            placed = _placed_plan(mesh, plan)
            agg_k = make_boundary_aggregate(
                mesh, ds.num_entity, placed, use_pallas=True, interpret=True)
            ets = jax.device_put(et, row)

            out = agg_k(xs, rel, ets, half_s)
            expect = aggregate_half(jnp.asarray(x), rel, et, half,
                                    ds.num_entity)
            np.testing.assert_allclose(
                np.asarray(out)[: ds.num_entity], np.asarray(expect),
                rtol=1e-5, atol=1e-5, err_msg=half_name)

            def loss_k(xv, rv, etv):
                return jnp.sum(agg_k(xv, rv, etv, half_s) ** 2)

            def loss_d(xv, rv, etv):
                return jnp.sum(jnp.pad(
                    aggregate_half(xv, rv, etv, half, ds.num_entity),
                    ((0, n_pad - ds.num_entity), (0, 0))) ** 2)

            gk = jax.grad(loss_k, argnums=(0, 1, 2))(xs, rel, ets)
            gd = jax.grad(loss_d, argnums=(0, 1, 2))(jnp.asarray(x), rel, et)
            np.testing.assert_allclose(
                np.asarray(gk[0])[: ds.num_entity], np.asarray(gd[0]),
                rtol=1e-4, atol=1e-5, err_msg=f"{half_name} d_x")
            np.testing.assert_allclose(
                np.asarray(gk[1]), np.asarray(gd[1]),
                rtol=1e-4, atol=1e-5, err_msg=f"{half_name} d_rel")
            np.testing.assert_allclose(
                np.asarray(gk[2]), np.asarray(gd[2]),
                rtol=1e-4, atol=1e-5, err_msg=f"{half_name} d_etab")
