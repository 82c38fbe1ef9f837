"""Integration: Toy end-to-end train → eval → checkpoint → resume on CPU
(SURVEY.md §4 'integration' tier)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from kgc_gcn_tpu.train.loop import Trainer, train_and_evaluate
from kgc_gcn_tpu.train.optim import epoch_lr, make_optimizer


@pytest.fixture(scope="module")
def _setup_once(toy, toy_cfg):
    ds, g, banks = toy
    cfg = toy_cfg.replace(max_epoch=3, eval_every=1, min_epoch=0,
                          num_filter=2, lbl_smooth=0.1)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    trainer = Trainer(cfg, model, g, banks)
    # keep pristine host copies: the jitted train steps DONATE params/state/
    # opt_state buffers, so each test needs fresh device arrays
    host = jax.tree.map(np.asarray, (params, state, opt_state))
    return ds, cfg, model, trainer, host


@pytest.fixture()
def setup(_setup_once):
    ds, cfg, model, trainer, host = _setup_once
    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    return ds, cfg, model, trainer, params, state, opt_state


def test_epoch_lr_steps():
    from kgc_gcn_tpu.config import Config
    cfg = Config(learning_rate=0.002)
    # epochs 1..10 at base, 11 at base*gamma (StepLR stepped per epoch)
    assert epoch_lr(cfg, 1) == 0.002
    assert epoch_lr(cfg, 10) == 0.002
    assert abs(epoch_lr(cfg, 11) - 0.002 * 0.995) < 1e-12
    assert abs(epoch_lr(cfg, 21) - 0.002 * 0.995 ** 2) < 1e-12


def test_epoch_lr_schedules():
    from kgc_gcn_tpu.config import Config
    # warmup ramps linearly, then the base schedule takes over
    cfg = Config(learning_rate=0.01, warmup_epochs=4)
    assert abs(epoch_lr(cfg, 1) - 0.0025) < 1e-12
    assert abs(epoch_lr(cfg, 4) - 0.01) < 1e-12
    assert abs(epoch_lr(cfg, 5) - 0.01) < 1e-12     # step: gamma^0
    # cosine: base at start, ~0 at the end, halfway at midpoint
    cfg = Config(learning_rate=0.01, lr_schedule="cosine", max_epoch=100)
    assert abs(epoch_lr(cfg, 1) - 0.01) < 1e-12
    assert epoch_lr(cfg, 100) < 0.01 * 0.01
    assert abs(epoch_lr(cfg, 51) - 0.005) < 1e-4
    # constant
    cfg = Config(learning_rate=0.01, lr_schedule="constant")
    assert epoch_lr(cfg, 1) == epoch_lr(cfg, 500) == 0.01


def test_train_epoch_reduces_loss(setup):
    ds, cfg, model, trainer, params, state, opt_state = setup
    host_rng = np.random.default_rng(0)
    losses = []
    for epoch in range(1, 6):
        params, state, opt_state, loss = trainer.train_epoch(
            params, state, opt_state, epoch, host_rng,
            jax.random.PRNGKey(epoch))
        losses.append(loss)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_scan_and_loop_modes_agree(setup):
    """scan_epoch=True and the per-batch loop agree per STEP.

    Per-step loss sequences are the binding check: losses are insensitive to
    the architecture's degenerate parameter directions (where Adam amplifies
    scan-vs-unrolled ulp reassociation into lr-sized steps), so wrong batch
    order, wrong rng threading, or a wrong update composition would show as
    O(1e-2..1) loss divergence while float noise stays ~1e-6 relative."""
    from kgc_gcn_tpu.data.batching import epoch_batches

    ds, cfg, model, trainer, params, state, opt_state = setup
    bank = trainer.banks["train"]
    lr = jnp.float32(epoch_lr(cfg, 1))
    idx, mask = epoch_batches(bank.n_queries, cfg.batch_size,
                              np.random.default_rng(5))
    idx, mask = jnp.asarray(idx), jnp.asarray(mask)
    fresh = lambda t: jax.tree.map(lambda x: jnp.array(np.asarray(x)), t)

    # scan mode: one jitted epoch, per-step losses from the scan
    p1, s1, o1, losses1 = trainer._train_epoch_jit(
        *fresh((params, state, opt_state)), trainer.graph,
        jax.random.PRNGKey(9), lr, idx, mask, bank.queries, bank.label_idx)

    # loop mode: identical plan/key threading through the per-step jit
    # (exactly what train_epoch's scan_epoch=False branch executes)
    p2, s2, o2 = fresh((params, state, opt_state))
    key = jax.random.PRNGKey(9)
    losses2 = []
    for s in range(idx.shape[0]):
        key, sub = jax.random.split(key)
        p2, s2, o2, l = trainer._train_step_jit(
            p2, s2, o2, trainer.graph, lr, bank.queries[idx[s]],
            bank.label_idx[idx[s]], mask[s], sub)
        losses2.append(float(l))

    np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses2),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)

    # the product scan_epoch=False path reports the same mean loss
    loop_trainer = Trainer(cfg.replace(scan_epoch=False), model,
                           trainer.graph, trainer.banks)
    _, _, _, l_loop = loop_trainer.train_epoch(
        *fresh((params, state, opt_state)), 1, np.random.default_rng(5),
        jax.random.PRNGKey(9))
    assert abs(float(jnp.mean(losses1)) - l_loop) < 1e-5


def test_training_is_deterministic(setup):
    """Two runs from identical state + seed produce IDENTICAL losses — the
    determinism guarantee that stands in for race detection (SURVEY §5.2):
    any nondeterministic reduction or stray RNG stream would break equality.
    """
    ds, cfg, model, trainer, params, state, opt_state = setup
    host = jax.tree.map(np.asarray, (params, state, opt_state))

    def run():
        p, s, o = jax.tree.map(jnp.asarray, host)
        rng = np.random.default_rng(3)
        out = []
        for epoch in (1, 2):
            p, s, o, loss = trainer.train_epoch(
                p, s, o, epoch, rng, jax.random.PRNGKey(epoch))
            out.append(loss)
        return out

    assert run() == run()


def test_metrics_jsonl_written(setup, tmp_path):
    """train_and_evaluate appends one machine-readable JSON line per epoch
    (loss/lr/steps-per-s, plus val metrics + best on eval epochs)."""
    import json as _json
    ds, cfg, model, trainer, params, state, opt_state = setup
    train_and_evaluate(trainer, params, state, opt_state, str(tmp_path),
                       seed=0)
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    all_recs = [_json.loads(l) for l in lines]
    assert all_recs[0].get("run_start") is True   # run delimiter
    recs = [r for r in all_recs if "epoch" in r]
    assert [r["epoch"] for r in recs] == list(range(1, cfg.max_epoch + 1))
    assert all("loss" in r and "lr" in r for r in recs)
    evald = [r for r in recs if r["epoch"] % cfg.eval_every == 0]
    assert evald and all("val" in r and "best_mrr" in r for r in evald)
    assert set(evald[0]["val"]) == {"mr", "mrr", "hits@1", "hits@3",
                                    "hits@10"}


def test_remat_step_matches_plain(setup):
    """--remat (jax.checkpoint around the encoder) changes memory, not math:
    one train step produces the same loss and parameters."""
    ds, cfg, model, trainer, params, state, opt_state = setup
    host = jax.tree.map(np.asarray, (params, state, opt_state))
    bank = trainer.banks["train"]
    B = cfg.batch_size
    q = bank.queries[:B]
    li = bank.label_idx[:B]
    ones = jnp.ones((B,), jnp.float32)

    p1, s1, o1, l1 = trainer._train_step_jit(
        params, state, opt_state, trainer.graph, jnp.float32(1e-3), q, li,
        ones, jax.random.PRNGKey(2))

    rt = Trainer(cfg.replace(remat=True), model, trainer.graph, trainer.banks)
    params, state, opt_state = jax.tree.map(jnp.asarray, host)
    p2, s2, o2, l2 = rt._train_step_jit(
        params, state, opt_state, trainer.graph, jnp.float32(1e-3), q, li,
        ones, jax.random.PRNGKey(2))

    assert abs(float(l1) - float(l2)) < 1e-6
    for a, b in zip(jax.tree.leaves((p1, s1)), jax.tree.leaves((p2, s2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_evaluate_produces_sane_metrics(setup):
    ds, cfg, model, trainer, params, state, opt_state = setup
    res = trainer.evaluate(params, state, "valid")
    assert set(res) == {"mr", "mrr", "hits@1", "hits@3", "hits@10"}
    assert 1.0 <= res["mr"] <= ds.num_entity
    assert 0.0 < res["mrr"] <= 1.0
    assert res["hits@1"] <= res["hits@3"] <= res["hits@10"] <= 1.0


def test_eval_count_covers_all_queries(setup):
    ds, cfg, model, trainer, params, state, opt_state = setup
    sums = trainer._predict(params, state, trainer.banks["valid_tail"])
    assert sums["count"] == len(ds.valid_triples)


def test_checkpoint_roundtrip(setup, tmp_path):
    ds, cfg, model, trainer, params, state, opt_state = setup
    tree = {"params": params, "state": state, "opt_state": opt_state}
    save_checkpoint(str(tmp_path), tree, 0.375)
    restored, measure = load_checkpoint(str(tmp_path), tree)
    assert measure == 0.375
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_and_evaluate_driver(setup, tmp_path):
    ds, cfg, model, trainer, params, state, opt_state = setup
    p, s, o, best = train_and_evaluate(
        trainer, params, state, opt_state, str(tmp_path), 0.0, seed=0)
    assert best > 0.0
    # best checkpoint was written and restores
    restored, measure = load_checkpoint(
        str(tmp_path), {"params": params, "state": state, "opt_state": opt_state})
    assert measure == best


@pytest.mark.parametrize("neg_loss", ["bce", "margin", "self_adversarial"])
def test_negative_sampling_smoke(toy, toy_cfg, neg_loss):
    """negative-sampling train mode runs and updates params under each
    objective (--neg_loss bce|margin|self_adversarial)."""
    ds, g, banks = toy
    from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
    cfg = toy_cfg.replace(model="rgcn", decoder="distmult",
                          train_mode="negative_sampling", num_negatives=4,
                          num_bases=2, neg_loss=neg_loss)
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    trainer = NegativeSamplingTrainer(cfg, model, g, banks)
    before = np.asarray(jax.tree.leaves(params)[0]).copy()
    p, s, o, loss = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(0),
        jax.random.PRNGKey(1))
    assert np.isfinite(loss)
    after = np.asarray(jax.tree.leaves(p)[0])
    assert not np.allclose(before, after)


def test_negative_sampling_rejects_unknown_loss(toy, toy_cfg):
    ds, g, banks = toy
    from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
    cfg = toy_cfg.replace(train_mode="negative_sampling", neg_loss="nope")
    model = build_model(cfg, ds.num_entity, ds.num_relation,
                        ds.num_edge, e_pad=g.e_pad)
    with pytest.raises(ValueError, match="neg_loss"):
        NegativeSamplingTrainer(cfg, model, g, banks)


def test_checkpoint_orbax_roundtrip(setup, tmp_path):
    ds, cfg, model, trainer, params, state, opt_state = setup
    tree = {"params": params, "state": state}
    from kgc_gcn_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    save_checkpoint(str(tmp_path), tree, 0.5, backend="orbax")
    restored, measure = load_checkpoint(str(tmp_path), tree)
    assert abs(measure - 0.5) < 1e-6   # stored as f32
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # saving again overwrites cleanly
    save_checkpoint(str(tmp_path), tree, 0.6, backend="orbax")
    _, measure = load_checkpoint(str(tmp_path), tree)
    assert abs(measure - 0.6) < 1e-6


def test_bf16_moment_adam_tracks_f32():
    """bf16-moment Adam follows f32 Adam closely over a short run and keeps
    the optax state layout (train/optim.py:_scale_by_adam_lowp)."""
    import optax
    from kgc_gcn_tpu.config import Config

    cfg32 = Config(clip_grad=1.0, weight_decay=0.0)
    cfg16 = cfg32.replace(moment_dtype="bfloat16")
    tx32, tx16 = make_optimizer(cfg32), make_optimizer(cfg16)

    params = {"w": jnp.linspace(-1.0, 1.0, 32).reshape(4, 8)}
    s32, s16 = tx32.init(params), tx16.init(params)
    adam16 = s16[-1]
    assert isinstance(adam16, optax.ScaleByAdamState)
    assert adam16.mu["w"].dtype == jnp.bfloat16
    assert adam16.nu["w"].dtype == jnp.bfloat16

    p32 = p16 = params
    rng = np.random.default_rng(0)
    for _ in range(20):
        g = {"w": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)}
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = optax.apply_updates(p32, jax.tree.map(lambda u: -0.01 * u, u32))
        p16 = optax.apply_updates(p16, jax.tree.map(lambda u: -0.01 * u, u16))
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=0.02, atol=2e-3)


@pytest.mark.parametrize("composition", ["sub", "corr"])
def test_composition_variants_train(composition, toy, toy_cfg):
    """CompGCN sub/corr compositions train end-to-end on the XLA path."""
    from kgc_gcn_tpu.models import build_model

    ds, graph, banks = toy
    cfg = toy_cfg.replace(composition=composition)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=graph.e_pad)
    trainer = Trainer(cfg, model, graph, banks)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    params, state, opt_state, loss = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(0),
        jax.random.PRNGKey(1))
    assert np.isfinite(loss)


def test_composition_requires_xla_path(toy, toy_cfg):
    from kgc_gcn_tpu.models import build_model
    ds, graph, banks = toy
    cfg = toy_cfg.replace(composition="sub", use_pallas=True)
    with pytest.raises(ValueError, match="XLA aggregation path"):
        build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                    e_pad=graph.e_pad)


def test_checkpoint_roundtrip_bf16_moments(toy, toy_cfg, tmp_path):
    """Save/restore preserves bf16 Adam moment dtypes and values."""
    from kgc_gcn_tpu.models import build_model

    ds, graph, banks = toy
    cfg = toy_cfg.replace(moment_dtype="bfloat16")
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=graph.e_pad)
    trainer = Trainer(cfg, model, graph, banks)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    params, state, opt_state, _ = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(0),
        jax.random.PRNGKey(1))

    tree = {"params": params, "state": state, "opt_state": opt_state}
    save_checkpoint(str(tmp_path), tree, 0.5)
    restored, measure = load_checkpoint(str(tmp_path), tree)
    assert abs(measure - 0.5) < 1e-6
    import optax
    adam = next(s for s in jax.tree.leaves(
        restored["opt_state"], is_leaf=lambda x: isinstance(
            x, optax.ScaleByAdamState)) if isinstance(
                x := s, optax.ScaleByAdamState))
    mu_leaves = jax.tree.leaves(adam.mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
    for a, b in zip(jax.tree.leaves(tree["opt_state"]),
                    jax.tree.leaves(restored["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_memorizes_train_triples_high_mrr(toy, toy_cfg):
    """End-to-end learning check: enough epochs of full-batch training must
    drive filtered MRR on the TRAIN triples near 1 (memorization) — validates
    the whole optimize -> encode -> decode -> rank loop beyond
    loss-goes-down (SURVEY.md §4 integration tier; accuracy targets on real
    corpora are not exercisable in this environment)."""
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.models import build_model

    ds, graph, banks = toy
    cfg = toy_cfg.replace(learning_rate=0.01, lbl_smooth=0.1,
                          gcn_drop=0.0, conv_drop=0.0, hidden_drop=0.0,
                          feat_drop=0.0)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=graph.e_pad)

    # eval bank over the train triples (tail direction), filters = train sr2o
    tri = ds.train_triples
    sr2o = {}
    for s, r, o in tri:
        sr2o.setdefault((int(s), int(r)), []).append(int(o))
    eq = np.array([[s, r, o] for s, r, o in tri], np.int32)
    labels = [sr2o[(int(s), int(r))] for s, r, _ in tri]
    train_eval = make_query_bank(eq, labels, ds.num_entity)

    trainer = Trainer(cfg, model, graph,
                      {**banks, "train_tail": train_eval,
                       "train_head": train_eval})
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    host = np.random.default_rng(0)
    for epoch in range(1, 161):
        params, state, opt_state, loss = trainer.train_epoch(
            params, state, opt_state, epoch, host, jax.random.PRNGKey(epoch))
    res = trainer.evaluate(params, state, "train", mark="TrainFit")
    assert res["mrr"] > 0.85, res
    assert res["hits@1"] > 0.75, res


def test_periodic_async_checkpoint(toy, toy_cfg, tmp_path):
    """ckpt_every writes restorable crash-insurance checkpoints alongside the
    save-on-improvement best checkpoint (train/checkpoint.py async path)."""
    import os
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.checkpoint import PERIODIC_DIR

    ds, graph, banks = toy
    cfg = toy_cfg.replace(max_epoch=3, eval_every=10, ckpt_every=2,
                          num_filter=2)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=graph.e_pad)
    trainer = Trainer(cfg, model, graph, banks)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    p, s, o, best = train_and_evaluate(
        trainer, params, state, opt_state, model_dir=str(tmp_path))

    path = os.path.join(str(tmp_path), PERIODIC_DIR)
    assert os.path.isdir(path), os.listdir(str(tmp_path))
    tpl = {"params": p, "state": s, "opt_state": o}
    restored, measure = load_checkpoint(path, tpl)
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(p)):
        assert np.asarray(a).shape == np.asarray(b).shape
    assert np.isfinite(measure)


def test_per_relation_metrics_aggregate_to_overall(setup):
    """Count-weighted per-relation MRR/MR/Hits must reproduce the corpus
    metrics exactly (same ranks, same filtering, different grouping)."""
    ds, cfg, model, trainer, params, state, opt_state = setup
    overall = trainer.evaluate(params, state, "valid")
    per = trainer.evaluate_per_relation(params, state, "valid")
    c = per["count"]
    total = c.sum()
    for key in ("mr", "mrr", "hits@1", "hits@3", "hits@10"):
        vals = np.where(np.isnan(per[key]), 0.0, per[key])
        agg = float((vals * c).sum() / total)
        assert abs(agg - overall[key]) < 1e-4, (key, agg, overall[key])
    # tail+head per forward relation: counts match the split's triple counts
    tri = ds.valid_triples
    want = np.bincount(tri[:, 1], minlength=ds.num_relation)
    np.testing.assert_array_equal(c.astype(int), want)


def test_rgcn_warns_on_trainerless_kernel_path(toy, toy_cfg, caplog):
    """use_pallas without prepare_kernels silently ran the XLA backward at
    4.7x the step cost (round-4 verdict) — encode must say so once."""
    import logging

    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgcn", decoder="distmult", num_bases=2,
                          use_pallas=True)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    with caplog.at_level(logging.WARNING):
        model.encode(params, state, g)
        model.encode(params, state, g)   # once only
    hits = [r for r in caplog.records if "prepare_kernels" in r.message]
    assert len(hits) == 1, [r.message for r in caplog.records]

    # after prepare_kernels the warning never fires
    caplog.clear()
    model2 = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                         e_pad=g.e_pad)
    model2.prepare_kernels(g)
    assert model2._bwd_plans and set(model2._bwd_plans) == {"inb", "outb"}
    with caplog.at_level(logging.WARNING):
        model2.encode(params, state, g)
    assert not [r for r in caplog.records if "prepare_kernels" in r.message]


def test_rgcn_prepare_kernels_guards(toy, toy_cfg, caplog):
    """num_bases > 128 exceeds the band kernel's fixed d_a block: the plan
    must not build (XLA backward fallback) and encode must not then claim
    prepare_kernels was skipped.  Entity-sharded / sharded-graph configs
    never use the plan — prepare_kernels must not waste memory building it."""
    import logging

    ds, g, banks = toy
    cfg = toy_cfg.replace(model="rgcn", decoder="distmult", num_bases=130,
                          use_pallas=True)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    with caplog.at_level(logging.WARNING):
        model.prepare_kernels(g)
    assert model._bwd_plans == {}
    assert [r for r in caplog.records if "128-column" in r.message]
    params, state = model.init(jax.random.PRNGKey(0))
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        model.encode(params, state, g)
    assert not [r for r in caplog.records if "prepare_kernels" in r.message]

    # sharded-graph mesh: encode's kernel gate is off, so no plan is built
    from kgc_gcn_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(data=1, graph=4)
    cfg2 = toy_cfg.replace(model="rgcn", decoder="distmult", num_bases=2,
                           use_pallas=True)
    m3 = build_model(cfg2, ds.num_entity, ds.num_relation, ds.num_edge,
                     e_pad=g.e_pad, mesh=mesh)
    m3.prepare_kernels(g)
    assert m3._bwd_plans is None
