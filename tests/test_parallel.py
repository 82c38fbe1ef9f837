"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4):
edge-partitioned + data-parallel training steps compile, run, and match the
single-device result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph, shard_params
from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.train.loop import Trainer
from kgc_gcn_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def _setup(toy, toy_cfg):
    ds, g, banks = toy
    cfg = toy_cfg.replace(num_filter=2, batch_size=8)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return ds, g, banks, cfg, model, params, state, opt_state


def _one_step(trainer, params, state, opt_state, graph, bank, batch, put=None):
    q = np.asarray(bank.queries[:batch])
    lbl = np.asarray(bank.label_idx[:batch])
    mask = np.ones((batch,), np.float32)
    if put:
        q, lbl, mask = put(q), put(lbl), put(mask)
    return trainer._train_step_jit(
        params, state, opt_state, graph, jnp.float32(1e-3),
        jnp.asarray(q), jnp.asarray(lbl), jnp.asarray(mask),
        jax.random.PRNGKey(3))


def test_sharded_step_matches_single_device(toy, toy_cfg, eight_devices):
    ds, g, banks, cfg, model, params, state, opt_state = _setup(toy, toy_cfg)
    batch = 8
    # jitted steps donate their inputs — keep host copies for the second run
    host = jax.tree.map(np.asarray, (params, state, opt_state))

    # single device
    t1 = Trainer(cfg, model, g, banks)
    p1, s1, o1, l1 = _one_step(t1, params, state, opt_state, g,
                               banks["train"], batch)
    params, state, opt_state = jax.tree.map(jnp.asarray, host)

    # 2 (data) x 4 (graph) mesh
    mesh = make_mesh(data=2, graph=4)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        bsp = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        t2 = Trainer(cfg, model, gs, banks, mesh=mesh)
        p2, s2, o2, l2 = _one_step(
            t2, ps, ss, os_, gs, banks["train"], batch,
            put=lambda x: jax.device_put(x, bsp))

    assert abs(float(l1) - float(l2)) < 1e-5
    # sharded collectives reassociate float sums; Adam's rsqrt amplifies the
    # ulp-level differences on near-zero moments — loose tolerances still
    # catch semantic divergence (which would be O(1))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_graph_sharding_layout(toy, eight_devices):
    ds, g, banks = toy
    mesh = make_mesh(data=1, graph=8)
    gs = shard_graph(g, mesh)
    # edge arrays are split along the graph axis
    shard_shapes = {sh.data.shape for sh in gs.inb.src.addressable_shards}
    assert shard_shapes == {(g.e_pad // 8,)}
    # indptr replicated
    assert gs.inb.indptr.addressable_shards[0].data.shape == (g.n_ent + 1,)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(data=100, graph=100)


def test_shard_map_aggregate_matches_single_device(toy, eight_devices):
    """Explicit shard_map edge-partitioned aggregation == plain segment-sum."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half
    from kgc_gcn_tpu.parallel.edge_parallel import make_sharded_aggregate

    ds, g, banks = toy
    rng = np.random.default_rng(0)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))

    mesh = make_mesh(data=1, graph=8)
    gs = shard_graph(g, mesh)
    with mesh:
        agg = make_sharded_aggregate(mesh, ds.num_entity)
        out = jax.jit(agg)(x, rel, et, gs.inb)
        # gradients flow through the psum
        grad = jax.grad(lambda xx: jnp.sum(agg(xx, rel, et, gs.inb) ** 2))(x)

    ref = aggregate_half(x, rel, et, g.inb, ds.num_entity)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    ref_grad = jax.grad(lambda xx: jnp.sum(
        aggregate_half(xx, rel, et, g.inb, ds.num_entity) ** 2))(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-4)


def test_edge_table_shards_along_graph_axis(toy, toy_cfg, eight_devices):
    """shard_params partitions the per-edge tables (and their Adam moments)
    row-aligned with the edge partition; everything else is replicated."""
    ds, g, banks, cfg, model, params, state, opt_state = _setup(
        toy, toy_cfg.replace(num_layers=2))
    mesh = make_mesh(data=2, graph=4)
    ps = shard_params(params, mesh)
    os_ = shard_params(opt_state, mesh)

    def table_shard_shapes(tab):
        return {sh.data.shape for sh in tab.addressable_shards}

    want = {(2, g.e_pad // 4, cfg.gcn_in_dim)}
    assert table_shard_shapes(ps.edge_embeddings) == want
    assert table_shard_shapes(ps.extra_edge_embeddings[0]) == {
        (2, g.e_pad // 4, cfg.gcn_out_dim)}
    # entity table replicated (full shape on every device)
    assert {sh.data.shape for sh in ps.entity_embedding.addressable_shards} \
        == {params.entity_embedding.shape}
    # Adam moments mirror the params pytree -> table moments shard identically
    mus = [l for l in jax.tree.leaves(os_)
           if getattr(l, "shape", None) == params.edge_embeddings.shape]
    assert mus and all(table_shard_shapes(m) == want for m in mus)


def test_entity_sharded_aggregate_matches_single_device(toy, eight_devices):
    """all_gather + psum_scatter entity-sharded path == plain segment-sum."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half
    from kgc_gcn_tpu.parallel.edge_parallel import make_entity_sharded_aggregate
    from kgc_gcn_tpu.parallel.mesh import shard_graph

    ds, g, banks = toy
    rng = np.random.default_rng(11)
    d = 8
    x = rng.normal(size=(ds.num_entity, d)).astype(np.float32)
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))

    expect = aggregate_half(jnp.asarray(x), rel, et, g.inb, ds.num_entity)

    mesh = make_mesh(data=1, graph=8)
    with mesh:
        gs = shard_graph(g, mesh)
        agg = make_entity_sharded_aggregate(mesh, ds.num_entity)
        xp = np.zeros((agg.n_pad, d), np.float32)
        xp[: ds.num_entity] = x
        row = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("graph"))
        xs = jax.device_put(xp, row)
        ets = jax.device_put(et, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("graph")))
        out = agg(xs, rel, ets, gs.inb)
        # per-device output rows: 1/8 of the padded entity rows each
        assert {s.data.shape for s in out.addressable_shards} \
            == {(agg.n_pad // 8, d)}

    np.testing.assert_allclose(np.asarray(out)[: ds.num_entity],
                               np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_ring_aggregate_matches_single_device(toy, eight_devices):
    """ppermute-ring entity exchange == plain segment-sum (both halves)."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half
    from kgc_gcn_tpu.parallel.edge_parallel import (
        build_ring_blocks, make_ring_aggregate)
    from kgc_gcn_tpu.parallel.mesh import shard_graph

    ds, g, banks = toy
    rng = np.random.default_rng(13)
    d = 8
    mesh = make_mesh(data=1, graph=8)
    agg = make_ring_aggregate(mesh, ds.num_entity)

    x = rng.normal(size=(ds.num_entity, d)).astype(np.float32)
    xp = np.zeros((agg.n_pad, d), np.float32)
    xp[: ds.num_entity] = x
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))

    with mesh:
        gs = shard_graph(g, mesh)
        row = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("graph"))
        xs = jax.device_put(xp, row)
        for half_name in ("inb", "outb"):
            half, half_s = getattr(g, half_name), getattr(gs, half_name)
            et = jnp.asarray(rng.normal(
                size=(g.e_pad, d)).astype(np.float32))
            blocks, mask = build_ring_blocks(half, 8, agg.n_pad)
            bs = jax.device_put(blocks, row)
            ms = jax.device_put(mask, row)
            out = agg(xs, rel, jax.device_put(et, row), half_s, bs, ms)
            expect = aggregate_half(jnp.asarray(x), rel, et, half,
                                    ds.num_entity)
            np.testing.assert_allclose(
                np.asarray(out)[: ds.num_entity], np.asarray(expect),
                rtol=1e-5, atol=1e-5, err_msg=half_name)


def test_scan_epoch_under_mesh_matches_single_device(toy, toy_cfg,
                                                     eight_devices):
    """The PRODUCTION path — Trainer.train_epoch's whole-epoch lax.scan — on
    the 2x4 mesh equals the single-device epoch (same key -> same dropout
    masks; only collective float reassociation differs)."""
    ds, g, banks, cfg, model, params, state, opt_state = _setup(toy, toy_cfg)
    host = jax.tree.map(np.asarray, (params, state, opt_state))

    t1 = Trainer(cfg, model, g, banks)
    p1, s1, o1, l1 = t1.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(7),
        jax.random.PRNGKey(5))

    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=2, graph=4)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        t2 = Trainer(cfg, model, gs, banks, mesh=mesh)
        p2, s2, o2, l2 = t2.train_epoch(
            ps, ss, os_, 1, np.random.default_rng(7), jax.random.PRNGKey(5))

    assert abs(l1 - l2) < 5e-3, (l1, l2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_sharded_eval_matches_single_device(toy, toy_cfg, eight_devices):
    """Filtered-rank evaluation under the (data x graph) mesh == single-device
    metrics (eval is deterministic, so equality is exact up to float sums)."""
    ds, g, banks, cfg, model, params, state, opt_state = _setup(toy, toy_cfg)
    host = jax.tree.map(np.asarray, (params, state))

    t1 = Trainer(cfg, model, g, banks)
    r1 = t1.evaluate(params, state, "valid")

    params, state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=2, graph=4)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        t2 = Trainer(cfg, model, gs, banks, mesh=mesh)
        r2 = t2.evaluate(ps, ss, "valid")

    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-3, (k, r1[k], r2[k])


@pytest.mark.parametrize("schedule",
                         ["gather", "ring", "boundary", "gather+pallas",
                          "boundary+pallas"])
def test_entity_sharded_train_step_matches_single_device(
        toy, toy_cfg, eight_devices, schedule):
    """PRODUCT-grade entity sharding: a full train step (fwd + loss + bwd +
    clip + Adam) through cfg.entity_sharded == the single-device step —
    selected purely by flags.  Covers the shard_map schedules' gradients
    (ring: ppermute/scan transposes) AND BatchNorm statistics under the
    sharded entity axis (the SURVEY §7 hard part).  '<schedule>+pallas' runs
    that schedule with the per-shard/per-block MXU kernels as the local
    segment-sums (both scaling axes on the kernel path)."""
    use_pallas = schedule.endswith("+pallas")
    schedule = schedule.removesuffix("+pallas")
    ds, g, banks, cfg, model, params, state, opt_state = _setup(toy, toy_cfg)
    cfg = cfg.replace(use_pallas=use_pallas)
    if use_pallas:   # rebuild the single-device reference on the pallas path
        model = build_model(cfg, ds.num_entity, ds.num_relation,
                            ds.num_edge, e_pad=g.e_pad)
        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = make_optimizer(cfg).init(params)
    batch = 8
    host = jax.tree.map(np.asarray, (params, state, opt_state))

    t1 = Trainer(cfg, model, g, banks)
    p1, s1, o1, l1 = _one_step(t1, params, state, opt_state, g,
                               banks["train"], batch)

    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=2, graph=4)
    cfg2 = cfg.replace(entity_sharded=schedule, data_axis=2, graph_axis=4)
    model2 = build_model(cfg2, ds.num_entity, ds.num_relation,
                         ds.num_edge, e_pad=g.e_pad, mesh=mesh)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        bsp = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        t2 = Trainer(cfg2, model2, gs, banks, mesh=mesh)
        p2, s2, o2, l2 = _one_step(
            t2, ps, ss, os_, gs, banks["train"], batch,
            put=lambda x: jax.device_put(x, bsp))

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_pallas_sharded_aggregate_matches_single_device(toy, eight_devices):
    """Per-shard Pallas kernels under shard_map == plain segment-sum,
    forward and every gradient (the edge partition actually carries the
    kernel; GSPMD alone would reshard the custom call to replicated)."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half
    from kgc_gcn_tpu.parallel.edge_parallel import (
        build_local_csr, make_pallas_sharded_aggregate)

    ds, g, banks = toy
    rng = np.random.default_rng(23)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    mesh = make_mesh(data=1, graph=8)
    gs = shard_graph(g, mesh)
    agg = make_pallas_sharded_aggregate(mesh, ds.num_entity, interpret=True)
    row = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("graph"))
    with mesh:
        for name in ("inb", "outb"):
            half, half_s = getattr(g, name), getattr(gs, name)
            et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
            csr = tuple(jax.device_put(a, row)
                        for a in build_local_csr(half, 8))

            out = agg(x, rel, jax.device_put(et, row), half_s, csr)
            expect = aggregate_half(x, rel, et, half, ds.num_entity)
            np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

            def loss(f):
                def go(x, rel, et):
                    return jnp.sum(f(x, rel, et) * w)
                return go

            g1 = jax.grad(loss(lambda *a: agg(*a, half_s, csr)),
                          argnums=(0, 1, 2))(x, rel, et)
            g2 = jax.grad(loss(lambda *a: aggregate_half(*a, half,
                                                         ds.num_entity)),
                          argnums=(0, 1, 2))(x, rel, et)
            for a, b, nm in zip(g1, g2, ("x", "rel", "edge")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                    err_msg=f"{name}:{nm}")


def test_pallas_train_step_under_mesh_matches_single_device(toy, toy_cfg,
                                                            eight_devices):
    """use_pallas + (data x graph) mesh: the full train step through the
    shard_map per-shard kernel schedule == the single-device pallas step."""
    ds, g, banks = toy
    cfg = toy_cfg.replace(num_filter=2, batch_size=8, use_pallas=True)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    host = jax.tree.map(np.asarray, (params, state, opt_state))
    batch = 8

    t1 = Trainer(cfg, model, g, banks)
    p1, s1, o1, l1 = _one_step(t1, params, state, opt_state, g,
                               banks["train"], batch)

    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=2, graph=4)
    model2 = build_model(cfg, ds.num_entity, ds.num_relation,
                         ds.num_edge, e_pad=g.e_pad, mesh=mesh)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        bsp = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        t2 = Trainer(cfg, model2, gs, banks, mesh=mesh)
        assert model2._edge_pallas_agg is not None   # kernel rides the mesh
        p2, s2, o2, l2 = _one_step(
            t2, ps, ss, os_, gs, banks["train"], batch,
            put=lambda x: jax.device_put(x, bsp))

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("schedule", ["gather", "ring", "boundary"])
def test_entity_sharded_multilayer_matches_single_device(toy, toy_cfg,
                                                         eight_devices,
                                                         schedule):
    """Depth layers chain through the entity-sharded schedules: a 2-layer
    encoder's full train step under --entity_sharded == single-device."""
    ds, g, banks = toy
    cfg = toy_cfg.replace(num_filter=2, batch_size=8, num_layers=2)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    host = jax.tree.map(np.asarray, (params, state, opt_state))
    batch = 8

    t1 = Trainer(cfg, model, g, banks)
    p1, s1, o1, l1 = _one_step(t1, params, state, opt_state, g,
                               banks["train"], batch)

    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=2, graph=4)
    cfg2 = cfg.replace(entity_sharded=schedule, data_axis=2, graph_axis=4)
    model2 = build_model(cfg2, ds.num_entity, ds.num_relation,
                         ds.num_edge, e_pad=g.e_pad, mesh=mesh)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        bsp = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        t2 = Trainer(cfg2, model2, gs, banks, mesh=mesh)
        p2, s2, o2, l2 = _one_step(
            t2, ps, ss, os_, gs, banks["train"], batch,
            put=lambda x: jax.device_put(x, bsp))

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_negative_sampling_trains_under_mesh(toy, toy_cfg, eight_devices):
    """The negative-sampling trainer's scan epoch runs under the mesh."""
    from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer

    ds, g, banks = toy
    cfg = toy_cfg.replace(num_filter=2, batch_size=8, decoder="distmult",
                          train_mode="negative_sampling", data_axis=2,
                          graph_axis=4)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    mesh = make_mesh(data=2, graph=4)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        t = NegativeSamplingTrainer(cfg, model, gs, banks, mesh=mesh)
        ps, ss, os_, loss = t.train_epoch(
            ps, ss, os_, 1, np.random.default_rng(0), jax.random.PRNGKey(1))
    assert np.isfinite(loss)


def test_entity_sharded_eval_matches_single_device(toy, toy_cfg,
                                                   eight_devices):
    """Filtered-rank evaluation through the entity-sharded encoder == the
    single-device metrics."""
    ds, g, banks, cfg, model, params, state, opt_state = _setup(toy, toy_cfg)
    host = jax.tree.map(np.asarray, (params, state))

    t1 = Trainer(cfg, model, g, banks)
    r1 = t1.evaluate(params, state, "valid")

    params, state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=1, graph=8)
    cfg2 = cfg.replace(entity_sharded="gather", graph_axis=8)
    model2 = build_model(cfg2, ds.num_entity, ds.num_relation,
                         ds.num_edge, e_pad=g.e_pad, mesh=mesh)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        t2 = Trainer(cfg2, model2, gs, banks, mesh=mesh)
        r2 = t2.evaluate(ps, ss, "valid")
    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-3, (k, r1[k], r2[k])


def test_sharded_step_with_rbg_keys(toy, toy_cfg, eight_devices):
    """The default prng_impl=rbg (TPU hardware RNG) must also compile and run
    under the (data x graph) mesh — dropout keys flow through GSPMD."""
    from kgc_gcn_tpu.train.loop import root_key

    ds, g, banks, cfg, model, params, state, opt_state = _setup(toy, toy_cfg)
    cfg = cfg.replace(prng_impl="rbg")
    mesh = make_mesh(data=2, graph=4)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        bsp = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        t = Trainer(cfg, model, gs, banks, mesh=mesh)
        bank = banks["train"]
        q = jax.device_put(np.asarray(bank.queries[:8]), bsp)
        lbl = jax.device_put(np.asarray(bank.label_idx[:8]), bsp)
        mask = jax.device_put(np.ones((8,), np.float32), bsp)
        _, _, _, loss = t._train_step_jit(
            ps, ss, os_, gs, jnp.float32(1e-3), q, lbl, mask,
            root_key(cfg, 3))
    assert np.isfinite(float(loss))


def test_rgat_epoch_matches_single_device(toy, toy_cfg, eight_devices):
    """The RGAT family's scanned epoch under the 2x4 mesh (GSPMD over the
    edge partition: sharded segment-softmax + segment-sums) equals the
    single-device epoch."""
    from kgc_gcn_tpu.data.graph import build_graph

    ds, _, banks = toy
    g0 = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                     pad_to=512)   # 8-way divisible edge padding
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          batch_size=4, data_axis=2, graph_axis=4)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g0.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg).init(params)
    host = lambda t: jax.tree.map(np.asarray, t)
    params_h, state_h, opt_h = host(params), host(state), host(opt)
    dev = lambda t: jax.tree.map(jnp.asarray, t)

    t0 = Trainer(cfg.replace(data_axis=1, graph_axis=1), model, g0, banks)
    p1, *_ , loss1 = t0.train_epoch(
        dev(params_h), dev(state_h), dev(opt_h), 1,
        np.random.default_rng(0), jax.random.PRNGKey(1))

    mesh = make_mesh(2, 4)
    gs = shard_graph(g0, mesh)
    tm = Trainer(cfg, model, gs, banks, mesh=mesh)
    p2, *_, loss2 = tm.train_epoch(
        shard_params(dev(params_h), mesh), shard_params(dev(state_h), mesh),
        shard_params(dev(opt_h), mesh), 1,
        np.random.default_rng(0), jax.random.PRNGKey(1))

    assert abs(float(loss1) - float(loss2)) < 1e-5
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)
    assert max(jax.tree.leaves(deltas)) < 1e-5


def test_per_relation_eval_matches_single_device(toy, toy_cfg, eight_devices):
    """evaluate_per_relation under the 2x4 mesh equals single-device (the
    per-relation segment sums ride the same sharded eval pass)."""
    from kgc_gcn_tpu.data.graph import build_graph

    ds, _, banks = toy
    g0 = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                     pad_to=512)
    cfg = toy_cfg.replace(batch_size=4, data_axis=2, graph_axis=4)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g0.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))

    t0 = Trainer(cfg.replace(data_axis=1, graph_axis=1), model, g0, banks)
    single = t0.evaluate_per_relation(params, state, "valid")

    mesh = make_mesh(2, 4)
    gs = shard_graph(g0, mesh)
    tm = Trainer(cfg, model, gs, banks, mesh=mesh)
    sharded = tm.evaluate_per_relation(
        shard_params(params, mesh), shard_params(state, mesh), "valid")

    for k in single:
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.parametrize("schedule", ["gather", "ring", "boundary"])
def test_rgcn_entity_sharded_step_matches_single_device(
        toy, toy_cfg, eight_devices, schedule):
    """RGCN (basis) through the SHARED entity-sharding schedules
    (parallel/entity_sharding.py + models/rgcn.basis_compose): a full train
    step under every exchange schedule == the single-device step.  The
    compose's (E, B*d_in) width exercises the schedules' width-generic
    paths (ring accumulator sizing, boundary output routing)."""
    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgcn", decoder="distmult", num_bases=3,
                          batch_size=8)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    batch = 8
    host = jax.tree.map(np.asarray, (params, state, opt_state))

    t1 = Trainer(cfg, model, g, banks)
    p1, s1, o1, l1 = _one_step(t1, params, state, opt_state, g,
                               banks["train"], batch)

    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    mesh = make_mesh(data=2, graph=4)
    cfg2 = cfg.replace(entity_sharded=schedule, data_axis=2, graph_axis=4)
    model2 = build_model(cfg2, ds.num_entity, ds.num_relation,
                         ds.num_edge, e_pad=g.e_pad, mesh=mesh)
    with mesh:
        gs = shard_graph(g, mesh)
        ps = shard_params(params, mesh)
        ss = shard_params(state, mesh)
        os_ = shard_params(opt_state, mesh)
        bsp = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        t2 = Trainer(cfg2, model2, gs, banks, mesh=mesh)
        p2, s2, o2, l2 = _one_step(
            t2, ps, ss, os_, gs, banks["train"], batch,
            put=lambda x: jax.device_put(x, bsp))

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_rgat_entity_sharded_ring_boundary_fail_fast():
    """RGAT × entity_sharded supports the gather schedule (round 5, two-pass
    distributed softmax); ring/boundary would need their own compressed
    max/denom exchanges — still a deliberate fail-fast, not a silent
    per-shard renormalization."""
    from kgc_gcn_tpu.config import dataset_preset
    mesh = make_mesh(data=1, graph=8)
    for sched in ("ring", "boundary"):
        cfg = dataset_preset("Toy", model="rgat", decoder="distmult",
                             entity_sharded=sched, graph_axis=8)
        with pytest.raises(ValueError, match="gather"):
            build_model(cfg, 12, 4, 40, mesh=mesh)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_rgat_entity_sharded_epoch_matches_single_device(
        toy, toy_cfg, eight_devices, use_pallas):
    """RGAT × entity_sharded='gather' (the round-4 verdict's designed-but-
    unbuilt two-pass distributed softmax, now built): a full scanned epoch
    with entity rows sharded over the graph axis == the single-chip path —
    attention renormalizes GLOBALLY across shard-straddling dst segments via
    pmax(max) + psum(denominator), and gradients flow through the
    collectives' transposes (params compared after Adam)."""
    from kgc_gcn_tpu.data.graph import build_graph

    ds, _, banks = toy
    g0 = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                     pad_to=512)   # axis-divisible edge padding
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          batch_size=4, use_pallas=use_pallas)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g0.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg).init(params)
    host = lambda t: jax.tree.map(np.asarray, t)
    params_h, state_h, opt_h = host(params), host(state), host(opt)
    dev = lambda t: jax.tree.map(jnp.asarray, t)

    t0 = Trainer(cfg, model, g0, banks)
    p1, *_, loss1 = t0.train_epoch(
        dev(params_h), dev(state_h), dev(opt_h), 1,
        np.random.default_rng(0), jax.random.PRNGKey(1))

    cfg2 = cfg.replace(entity_sharded="gather", data_axis=2, graph_axis=4)
    mesh = make_mesh(2, 4)
    model2 = build_model(cfg2, ds.num_entity, ds.num_relation, ds.num_edge,
                         e_pad=g0.e_pad, mesh=mesh)
    gs = shard_graph(g0, mesh)
    tm = Trainer(cfg2, model2, gs, banks, mesh=mesh)
    assert model2._es_csr is not None     # the sharded path is ACTUALLY on
    assert model2._edge_csr is None       # and not the edge-partition one
    p2, *_, loss2 = tm.train_epoch(
        shard_params(dev(params_h), mesh), shard_params(dev(state_h), mesh),
        shard_params(dev(opt_h), mesh), 1,
        np.random.default_rng(0), jax.random.PRNGKey(1))

    assert abs(float(loss1) - float(loss2)) < 1e-4
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_rgat_pallas_sharded_epoch_matches_single_device(
        toy, toy_cfg, eight_devices):
    """RGAT's per-shard attention kernels under the edge partition
    (models/rgat._make_sharded_attend: local CSR kernels + pmax/psum at the
    segment reductions) == the single-chip kernel path — full scanned epoch,
    params compared after Adam."""
    from kgc_gcn_tpu.data.graph import build_graph

    ds, _, banks = toy
    g0 = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                     pad_to=512)   # 8-way divisible edge padding
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          batch_size=4, use_pallas=True)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g0.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg).init(params)
    host = lambda t: jax.tree.map(np.asarray, t)
    params_h, state_h, opt_h = host(params), host(state), host(opt)
    dev = lambda t: jax.tree.map(jnp.asarray, t)

    t0 = Trainer(cfg, model, g0, banks)
    p1, *_, loss1 = t0.train_epoch(
        dev(params_h), dev(state_h), dev(opt_h), 1,
        np.random.default_rng(0), jax.random.PRNGKey(1))

    cfg2 = cfg.replace(data_axis=2, graph_axis=4)
    mesh = make_mesh(2, 4)
    model2 = build_model(cfg2, ds.num_entity, ds.num_relation, ds.num_edge,
                         e_pad=g0.e_pad, mesh=mesh)
    gs = shard_graph(g0, mesh)
    tm = Trainer(cfg2, model2, gs, banks, mesh=mesh)
    assert model2._edge_csr is not None   # the kernel path is ACTUALLY on
    p2, *_, loss2 = tm.train_epoch(
        shard_params(dev(params_h), mesh), shard_params(dev(state_h), mesh),
        shard_params(dev(opt_h), mesh), 1,
        np.random.default_rng(0), jax.random.PRNGKey(1))

    assert abs(float(loss1) - float(loss2)) < 1e-4
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)
