"""RGAT family: segment-softmax vs a numpy oracle, attention normalization,
full-logits/candidate consistency via the shared decoder machinery, and the
end-to-end train/eval smoke (one-vs-all and negative sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.models.rgat import segment_softmax
from kgc_gcn_tpu.train.loop import Trainer
from kgc_gcn_tpu.train.optim import make_optimizer


def test_segment_softmax_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    n_seg, e, h = 6, 40, 3
    seg = np.sort(rng.integers(0, n_seg, size=e)).astype(np.int32)
    logits = rng.normal(size=(e, h)).astype(np.float32)
    masked = rng.random(e) < 0.3
    logits[masked] = -np.inf

    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(seg),
                                     n_seg))
    for s in range(n_seg):
        rows = (seg == s) & ~masked
        if rows.any():
            want = np.exp(logits[rows] - logits[rows].max(0))
            want = want / want.sum(0)
            np.testing.assert_allclose(got[rows], want, rtol=1e-5, atol=1e-6)
    assert np.all(got[masked] == 0.0)           # masked edges get weight 0
    assert np.all(np.isfinite(got))             # empty segments stay finite


def test_attention_weights_sum_to_one_per_destination(toy, toy_cfg):
    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, _ = model.init(jax.random.PRNGKey(0))
    layer = params.layers[0]
    h = params.entity_embedding @ layer.weight
    from kgc_gcn_tpu.models.rgat import _attend_half
    del _attend_half  # weights checked directly below
    nh, dh = layer.att_src.shape
    half = g.inb
    z = (h[half.src] * layer.rel_mult[half.rel]).reshape(-1, nh, dh)
    s = (jnp.einsum("ehd,hd->eh", z, layer.att_src)
         + jnp.einsum("ehd,hd->eh", h[half.dst].reshape(-1, nh, dh),
                      layer.att_dst)
         + layer.rel_bias[half.rel])
    s = jax.nn.leaky_relu(s, 0.2)
    s = jnp.where(half.norm[:, None] > 0, s, -jnp.inf)
    alpha = np.asarray(segment_softmax(s, half.dst, ds.num_entity))
    dst = np.asarray(half.dst)
    real = np.asarray(half.norm) > 0
    sums = np.zeros((ds.num_entity, nh))
    np.add.at(sums, dst[real], alpha[real])
    has_in = np.zeros(ds.num_entity, bool)
    has_in[dst[real]] = True
    np.testing.assert_allclose(sums[has_in], 1.0, rtol=1e-5)
    np.testing.assert_allclose(sums[~has_in], 0.0)


@pytest.mark.parametrize("heads", [1, 4])
def test_rgat_train_eval_smoke(toy, toy_cfg, heads):
    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=heads,
                          num_layers=2)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    trainer = Trainer(cfg, model, g, banks)
    before = np.asarray(jax.tree.leaves(params)[0]).copy()
    p, s, o, loss = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(0),
        jax.random.PRNGKey(1))
    assert np.isfinite(loss)
    assert not np.allclose(before, np.asarray(jax.tree.leaves(p)[0]))
    res = trainer.evaluate(p, s, "valid")
    assert 0.0 < res["mrr"] <= 1.0


def test_rgat_rejects_bad_heads(toy, toy_cfg):
    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgat", num_heads=5)   # 5 does not divide 32
    with pytest.raises(ValueError, match="num_heads"):
        build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                    e_pad=g.e_pad)


def test_rgat_generalizes_on_compositional_corpus():
    """Held-out MRR >> chance on the compositional ring corpus (the same
    generalization gate the other families pass, tests/test_generalization):
    measured best-val 0.47 vs 0.042 chance over 400 epochs (crosses 0.3 by
    ~epoch 125 on CPU); the gate is 6x chance (0.25) with early stop."""
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_banks
    from kgc_gcn_tpu.data.dataset import build_dataset
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.data.toy import compositional_triples

    train, valid, test = compositional_triples(
        n_ent=48, offsets=(1, 3), held_frac=0.3)
    ds = build_dataset("sync", train, valid, test)
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                    pad_to=8)
    banks = make_banks(ds)
    cfg = dataset_preset("Toy", gcn_in_dim=16, gcn_out_dim=32,
                         decoder="complex", batch_size=32,
                         learning_rate=0.01, lbl_smooth=0.1, gcn_drop=0.1,
                         model="rgat", num_heads=4)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg).init(params)
    trainer = Trainer(cfg, model, g, banks)
    rng = np.random.default_rng(0)
    best = 0.0
    for epoch in range(1, 401):
        params, state, opt, _ = trainer.train_epoch(
            params, state, opt, epoch, rng, jax.random.PRNGKey(epoch))
        if epoch % 25 == 0:
            best = max(best,
                       trainer.evaluate(params, state, "valid")["mrr"])
            if best >= 0.3:
                break
    assert best > 0.25, f"held-out MRR {best:.3f} (chance 0.042)"


def test_rgat_negative_sampling_smoke(toy, toy_cfg):
    """RGAT composes with the negative-sampling trainer (self-adversarial)."""
    ds, g, banks = toy
    from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          train_mode="negative_sampling", num_negatives=4,
                          neg_loss="self_adversarial")
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    trainer = NegativeSamplingTrainer(cfg, model, g, banks)
    p, s, o, loss = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(0),
        jax.random.PRNGKey(1))
    assert np.isfinite(loss)


def test_rgat_pallas_path_matches_xla(toy, toy_cfg):
    """use_pallas routes the shared edge message (edge_compose), the
    weighted aggregation, the softmax reductions, and all their cotangents
    through the MXU CSR kernels (interpret mode on CPU) — full train step
    must equal the XLA segment-sum path."""
    ds, g, banks = toy
    base = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                           batch_size=8)
    results = {}
    for up in (False, True):
        cfg = base.replace(use_pallas=up)
        model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                            e_pad=g.e_pad)
        assert model._use_pallas == up
        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = make_optimizer(cfg).init(params)
        trainer = Trainer(cfg, model, g, banks)
        bank = banks["train"]
        p, s, o, loss = trainer._train_step_jit(
            params, state, opt_state, g, jnp.float32(1e-3),
            jnp.asarray(bank.queries[:8]), jnp.asarray(bank.label_idx[:8]),
            jnp.ones((8,), jnp.float32), jax.random.PRNGKey(3))
        results[up] = (jax.tree.map(np.asarray, p), float(loss))
    assert abs(results[False][1] - results[True][1]) < 1e-5
    for a, b in zip(jax.tree.leaves(results[False][0]),
                    jax.tree.leaves(results[True][0])):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_rgat_pallas_rides_graph_axis(toy, toy_cfg):
    """Under graph_axis > 1 the attention kernels ride the edge partition
    via per-shard shard_map (round-4; replaced the round-3 warn-disable):
    prepare_edge_sharding must build the local-CSR kernel path, and the
    single-chip flag stays on (the sharded path uses its own dispatch)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph
    ds, g0, banks = toy
    from kgc_gcn_tpu.data.graph import build_graph
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                    pad_to=512)
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          use_pallas=True, graph_axis=4, data_axis=2)
    mesh = make_mesh(data=2, graph=4)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad, mesh=mesh)
    assert model._use_pallas is True
    model.prepare_edge_sharding(shard_graph(g, mesh))
    assert model._edge_csr is not None
    assert model._sharded_attend is not None


def test_rgcn_pallas_basis_matches_xla(toy, toy_cfg):
    """RGCN's use_pallas path (MXU CSR kernel on the (E, B*d_in) basis
    expansion) == the XLA segment-sum path — full train step, params after
    Adam."""
    from kgc_gcn_tpu.train.optim import make_optimizer
    from kgc_gcn_tpu.train.loop import Trainer
    ds, g, banks = toy
    base = toy_cfg.replace(model="rgcn", decoder="distmult", num_bases=3,
                           batch_size=8)
    results = {}
    for up in (False, True):
        cfg = base.replace(use_pallas=up)
        model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                            e_pad=g.e_pad)
        params, state = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(cfg).init(params)
        t = Trainer(cfg, model, g, banks)
        q = np.asarray(banks["train"].queries[:8])
        lbl = np.asarray(banks["train"].label_idx[:8])
        results[up] = t._train_step_jit(
            params, state, opt, g, jnp.float32(1e-3), jnp.asarray(q),
            jnp.asarray(lbl), jnp.ones((8,), np.float32),
            jax.random.PRNGKey(3))
    p0, _, _, l0 = results[False]
    p1, _, _, l1 = results[True]
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_rgat_flat_layout_matches_3d(toy, toy_cfg, use_pallas, monkeypatch):
    """KGC_RGAT_LAYOUT=flat (H-blocked flat-lane layout: block-diagonal
    logits matmul + 0/1 block-indicator alpha expansion, round-5 A/B of the
    round-4 closing-trace idea) must be numerically identical to the 3D
    reshape layout — it is the same contraction re-expressed."""
    import kgc_gcn_tpu.models.rgat as rgat_mod

    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          use_pallas=use_pallas)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))

    outs = {}
    for layout in ("3d", "flat"):
        monkeypatch.setattr(rgat_mod, "RGAT_LAYOUT", layout)
        ae, ar, _ = model.encode(params, state, g)
        # gradients must match too (the flat layout reroutes the backward
        # through the block matmuls)
        grad = jax.grad(
            lambda p: float_sum(model.encode(p, state, g)[0]))(params)
        outs[layout] = (np.asarray(ae),
                        np.asarray(grad.layers[0].att_src),
                        np.asarray(grad.layers[0].rel_mult))
    for a, b in zip(outs["3d"], outs["flat"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def float_sum(x):
    import jax.numpy as jnp
    return jnp.sum(x * jnp.sin(jnp.arange(x.shape[-1])))  # asymmetric probe
