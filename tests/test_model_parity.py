"""Model parity: our jitted forward vs an independent numpy/torch oracle of the
reference equations (SURVEY.md §4 'parity' tier; BASELINE north star requires
per-layer activations allclose).

The oracle follows reference model.py:24-40 (MGCN.forward), 82-118 (MGCNConv),
159-179 (ConvE) written directly from the math — per-edge loops in numpy, the
7x7 convolution via torch — sharing no code with the implementation under test.
Eval mode (deterministic: no dropout, BN running stats); BN statistics are
randomized so normalization is actually exercised.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.models.common import BNParams, BNState, batch_norm, dropout


def _randomize_bn(params, state, rng):
    """Give every BN layer nontrivial scale/bias/running stats."""

    def rand_bn_params(p):
        return BNParams(
            scale=jnp.asarray(rng.uniform(0.5, 1.5, p.scale.shape), jnp.float32),
            bias=jnp.asarray(rng.normal(0, 0.3, p.bias.shape), jnp.float32))

    def rand_bn_state(s):
        return BNState(
            mean=jnp.asarray(rng.normal(0, 0.3, s.mean.shape), jnp.float32),
            var=jnp.asarray(rng.uniform(0.5, 2.0, s.var.shape), jnp.float32))

    def walk(node, fn, cls):
        if isinstance(node, cls):
            return fn(node)
        if dataclasses.is_dataclass(node):
            return type(node)(**{
                f.name: walk(getattr(node, f.name), fn, cls)
                for f in dataclasses.fields(node)})
        return node

    params = walk(params, rand_bn_params, BNParams)
    state = walk(state, rand_bn_state, BNState)
    return params, state


def _bn_eval(x, p, s, axis, eps=1e-5):
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    rs = lambda a: np.asarray(a).reshape(shape)
    return (x - rs(s.mean)) / np.sqrt(rs(s.var) + eps) * rs(p.scale) + rs(p.bias)


def _oracle_forward(ds, cfg, params, state, src, rel, graph):
    """Reference forward math in numpy + torch, eval mode.

    ``params.edge_embeddings`` is stored positionally (models/mgcn.py); map it
    to the reference's edge-id numbering so the oracle can index row i for
    reference edge i (reference model.py:18, data_loader.py:148).
    """
    from kgc_gcn_tpu.data.graph import edge_table_to_reference_order
    torch = pytest.importorskip("torch")
    N, R, E = ds.num_entity, ds.num_relation, ds.num_edge
    x = np.asarray(params.entity_embedding)
    rels = np.concatenate([np.asarray(params.relation_embedding),
                           np.asarray(params.conv.loop_rel)], axis=0)
    edge_tab = edge_table_to_reference_order(
        params.edge_embeddings, graph)[:, :cfg.gcn_in_dim]
    c = params.conv
    tri = ds.train_triples

    def ref_norm(row, col):
        deg = np.zeros(N)
        np.add.at(deg, row, 1.0)
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
        return dinv[row] * dinv[col]

    # in half: (s, r, o), eid i, aggregated at o (reference model.py:88,99)
    s_, r_, o_ = tri[:, 0], tri[:, 1], tri[:, 2]
    in_norm = ref_norm(s_, o_)
    in_res = np.zeros((N, cfg.gcn_out_dim), np.float32)
    for i in range(E):
        m = (x[s_[i]] * rels[r_[i]] * edge_tab[i]) @ np.asarray(c.in_weight)
        in_res[o_[i]] += m * in_norm[i]
    # out half: (o, r+R, s), eid E+i, aggregated at s (model.py:89-90,100)
    out_norm = ref_norm(o_, s_)
    out_res = np.zeros((N, cfg.gcn_out_dim), np.float32)
    for i in range(E):
        m = (x[o_[i]] * rels[r_[i] + R] * edge_tab[E + i]) @ np.asarray(c.out_weight)
        out_res[s_[i]] += m * out_norm[i]
    loop_res = (x * np.asarray(c.loop_rel) * np.asarray(c.loop_edge)) @ np.asarray(c.loop_weight)

    out = (in_res + out_res + loop_res) / 3.0
    all_ent = np.tanh(_bn_eval(out, c.bn, state.conv_bn, axis=1))
    all_rel = (rels @ np.asarray(c.rels_weight))[:-1]

    # ConvE decoder via torch (reference model.py:159-179), logits space
    d = params.decoder
    ds_ = state.decoder
    se = torch.tensor(all_ent[src])
    re = torch.tensor(all_rel[rel])
    stack = torch.cat([se.view(-1, 1, cfg.gcn_out_dim),
                       re.view(-1, 1, cfg.gcn_out_dim)], dim=1)
    img = stack.transpose(2, 1).reshape(-1, 1, 2 * cfg.k_w, cfg.k_h)
    xx = torch.tensor(_bn_eval(img.numpy(), d.bn0, ds_.bn0, axis=1))
    xx = torch.nn.functional.conv2d(xx, torch.tensor(np.asarray(d.conv_w)))
    xx = torch.tensor(_bn_eval(xx.numpy(), d.bn1, ds_.bn1, axis=1))
    xx = torch.relu(xx)
    xx = xx.reshape(len(src), -1)
    xx = xx @ torch.tensor(np.asarray(d.fc_w)).T + torch.tensor(np.asarray(d.fc_b))
    xx = torch.tensor(_bn_eval(xx.numpy(), d.bn2, ds_.bn2, axis=1))
    xx = torch.relu(xx)
    logits = xx @ torch.tensor(all_ent).T + torch.tensor(np.asarray(d.ent_bias))
    return np.asarray(logits), all_ent, all_rel


def test_mgcn_forward_matches_reference_math(toy, toy_cfg):
    ds, g, _ = toy
    cfg = toy_cfg
    rng = np.random.default_rng(42)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = _randomize_bn(params, state, rng)

    src = np.array([0, 3, 5, 1], np.int32)
    rel = np.array([0, 1, 2 * ds.num_relation - 1, 2], np.int32)

    logits, _ = model.apply(params, state, g, jnp.asarray(src),
                            jnp.asarray(rel), train=False)
    oracle_logits, oracle_ent, oracle_rel = _oracle_forward(
        ds, cfg, params, state, src, rel, g)

    # per-layer: encoder activations
    all_ent, all_rel, _ = model.encode(params, state, g, train=False)
    np.testing.assert_allclose(np.asarray(all_ent), oracle_ent, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(all_rel), oracle_rel, rtol=2e-4, atol=2e-5)
    # end-to-end logits
    np.testing.assert_allclose(np.asarray(logits), oracle_logits, rtol=2e-3, atol=2e-3)


def test_batch_norm_matches_torch_train_and_eval():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 6)).astype(np.float32)
    p = BNParams(scale=jnp.asarray(rng.uniform(0.5, 1.5, 6), jnp.float32),
                 bias=jnp.asarray(rng.normal(0, 0.3, 6), jnp.float32))
    s = BNState(mean=jnp.asarray(rng.normal(0, 0.2, 6), jnp.float32),
                var=jnp.asarray(rng.uniform(0.5, 2.0, 6), jnp.float32))

    tbn = torch.nn.BatchNorm1d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(np.asarray(p.scale)))
        tbn.bias.copy_(torch.tensor(np.asarray(p.bias)))
        tbn.running_mean.copy_(torch.tensor(np.asarray(s.mean)))
        tbn.running_var.copy_(torch.tensor(np.asarray(s.var)))

    # train mode: batch stats normalize, running stats update (unbiased var)
    tbn.train()
    t_out = tbn(torch.tensor(x)).detach().numpy()
    j_out, ns = batch_norm(jnp.asarray(x), p, s, train=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns.mean),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns.var),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)

    # eval mode: running stats normalize (torch's stats were updated by the
    # train pass above, so compare against our updated state ``ns``)
    tbn.eval()
    t_out = tbn(torch.tensor(x)).detach().numpy()
    j_out, _ = batch_norm(jnp.asarray(x), p, ns, train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)


def test_dropout_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000, 16))
    y = np.asarray(dropout(x, 0.3, key, train=True))
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.7, rtol=1e-5)
    assert 0.6 < (y != 0).mean() < 0.8
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.3, key, train=False)), 1.0)


def test_rgcn_basis_equals_dense_expansion(toy, toy_cfg):
    """Basis aggregation == explicitly materialized W_r = sum_b a_rb V_b."""
    ds, g, _ = toy
    cfg = toy_cfg.replace(model="rgcn", decoder="distmult", num_bases=3,
                          num_layers=1)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge)
    params, state = model.init(jax.random.PRNGKey(1))

    all_ent, _, _ = model.encode(params, state, g, train=False)

    layer = params.layers[0]
    V = np.asarray(layer.basis)          # (B, din, dout)
    A = np.asarray(layer.coeff)          # (2R, B)
    W = np.einsum("rb,bio->rio", A, V)   # dense per-relation weights
    x = np.asarray(params.entity_embedding)
    N = ds.num_entity
    expect = x @ np.asarray(layer.self_weight)
    for half in (g.inb, g.outb):
        src, dst, rel, norm = (np.asarray(a) for a in
                               (half.src, half.dst, half.rel, half.norm))
        for e in range(len(src)):
            expect[dst[e]] += norm[e] * x[src[e]] @ W[rel[e]]
    expect = np.maximum(expect, 0.0)     # relu
    np.testing.assert_allclose(np.asarray(all_ent), expect, rtol=1e-4, atol=1e-4)


def test_rgcn_block_equals_dense_blockdiag(toy, toy_cfg):
    ds, g, _ = toy
    cfg = toy_cfg.replace(model="rgcn", decoder="distmult", num_blocks=4,
                          num_layers=1, gcn_in_dim=8, gcn_out_dim=32)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge)
    params, state = model.init(jax.random.PRNGKey(2))
    all_ent, _, _ = model.encode(params, state, g, train=False)

    layer = params.layers[0]
    blocks = np.asarray(layer.blocks)    # (2R, B, din/B, dout/B)
    nb = blocks.shape[1]
    x = np.asarray(params.entity_embedding)
    expect = x @ np.asarray(layer.self_weight)
    for half in (g.inb, g.outb):
        src, dst, rel, norm = (np.asarray(a) for a in
                               (half.src, half.dst, half.rel, half.norm))
        for e in range(len(src)):
            xs = x[src[e]].reshape(nb, -1)
            m = np.concatenate([xs[b] @ blocks[rel[e], b] for b in range(nb)])
            expect[dst[e]] += norm[e] * m
    expect = np.maximum(expect, 0.0)
    np.testing.assert_allclose(np.asarray(all_ent), expect, rtol=1e-4, atol=1e-4)


def test_mgcn_train_step_gradients_match_torch_autograd(toy, toy_cfg):
    """Full training-loss gradient parity vs a torch-autograd oracle.

    The oracle re-implements the reference's train step end-to-end in torch
    (reference main.py:61-66: forward -> sigmoid -> BCELoss on smoothed
    multi-hot labels) with message passing via differentiable index_add and
    train-mode BatchNorm, sharing no code with the implementation under test.
    Dropout is inactive (deterministic step); gradients are compared for every
    parameter tensor, with our positional edge-embedding gradient mapped back
    to the reference's edge-id order.
    """
    import torch
    import torch.nn.functional as F
    from kgc_gcn_tpu.data.batching import build_labels
    from kgc_gcn_tpu.data.graph import edge_table_to_reference_order
    from kgc_gcn_tpu.ops.losses import bce_with_logits

    ds, g, _ = toy
    cfg = toy_cfg
    rng = np.random.default_rng(7)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(1))
    params, state = _randomize_bn(params, state, rng)

    N, R, E = ds.num_entity, ds.num_relation, ds.num_edge
    src = np.array([0, 3, 5, 1], np.int32)
    rel = np.array([0, 1, 2 * R - 1, 2], np.int32)
    label_idx = np.full((4, 3), N, np.int32)
    label_idx[0, :2] = [2, 4]
    label_idx[1, 0] = 7
    label_idx[2, :3] = [1, 2, 3]
    label_idx[3, 0] = 0
    y = build_labels(jnp.asarray(label_idx), N, smooth=0.1)

    # ---- our gradients (train mode, no dropout rngs -> deterministic)
    def our_loss(p):
        logits, _ = model.apply(p, state, g, jnp.asarray(src),
                                jnp.asarray(rel), train=True)
        return bce_with_logits(logits, y)

    our_val = float(our_loss(params))
    gr = jax.grad(our_loss)(params)

    # ---- torch oracle
    def t(a, grad=True):
        x = torch.tensor(np.asarray(a, np.float32))
        return x.requires_grad_() if grad else x

    c = params.conv
    d = params.decoder
    etab_ref = edge_table_to_reference_order(
        params.edge_embeddings, g)[:, :cfg.gcn_in_dim]
    leaves = {
        "x": t(params.entity_embedding),
        "rel_emb": t(params.relation_embedding),
        "etab": t(etab_ref),
        "in_w": t(c.in_weight), "out_w": t(c.out_weight),
        "loop_w": t(c.loop_weight), "rels_w": t(c.rels_weight),
        "loop_rel": t(c.loop_rel), "loop_edge": t(c.loop_edge),
        "bn_s": t(c.bn.scale), "bn_b": t(c.bn.bias),
        "conv_w": t(d.conv_w),
        "bn0_s": t(d.bn0.scale), "bn0_b": t(d.bn0.bias),
        "bn1_s": t(d.bn1.scale), "bn1_b": t(d.bn1.bias),
        "bn2_s": t(d.bn2.scale), "bn2_b": t(d.bn2.bias),
        "fc_w": t(d.fc_w), "fc_b": t(d.fc_b),
        "ent_bias": t(d.ent_bias),
    }
    L = leaves

    def bn_train(x, s, p_scale, p_bias, feat_axis=1):
        rm = torch.tensor(np.asarray(s.mean, np.float32)).clone()
        rv = torch.tensor(np.asarray(s.var, np.float32)).clone()
        return F.batch_norm(x, rm, rv, weight=p_scale, bias=p_bias,
                            training=True, momentum=0.1, eps=1e-5)

    tri = ds.train_triples
    s_, r_, o_ = (torch.tensor(tri[:, i].astype(np.int64)) for i in range(3))

    def ref_norm(row, col):
        deg = torch.zeros(N).index_add(0, row, torch.ones(len(row)))
        dinv = torch.where(deg > 0, deg.pow(-0.5), torch.zeros(()))
        return dinv[row] * dinv[col]

    rels_full = torch.cat([L["rel_emb"], L["loop_rel"]], dim=0)
    in_m = ((L["x"][s_] * rels_full[r_] * L["etab"][:E]) @ L["in_w"]
            ) * ref_norm(s_, o_)[:, None]
    in_res = torch.zeros(N, cfg.gcn_out_dim).index_add(0, o_, in_m)
    out_m = ((L["x"][o_] * rels_full[r_ + R] * L["etab"][E:]) @ L["out_w"]
             ) * ref_norm(o_, s_)[:, None]
    out_res = torch.zeros(N, cfg.gcn_out_dim).index_add(0, s_, out_m)
    loop_res = (L["x"] * L["loop_rel"] * L["loop_edge"]) @ L["loop_w"]

    h = (in_res + out_res + loop_res) / 3.0
    all_ent = torch.tanh(bn_train(h, state.conv_bn, L["bn_s"], L["bn_b"]))
    all_rel = (rels_full @ L["rels_w"])[:-1]

    se = all_ent[torch.tensor(src.astype(np.int64))]
    re = all_rel[torch.tensor(rel.astype(np.int64))]
    stack = torch.cat([se.view(-1, 1, cfg.gcn_out_dim),
                       re.view(-1, 1, cfg.gcn_out_dim)], dim=1)
    img = stack.transpose(2, 1).reshape(-1, 1, 2 * cfg.k_w, cfg.k_h)
    sd = state.decoder
    z = bn_train(img, sd.bn0, L["bn0_s"], L["bn0_b"])
    z = F.conv2d(z, L["conv_w"])
    z = torch.relu(bn_train(z, sd.bn1, L["bn1_s"], L["bn1_b"]))
    z = z.reshape(len(src), -1)
    z = z @ L["fc_w"].T + L["fc_b"]
    z = torch.relu(bn_train(z, sd.bn2, L["bn2_s"], L["bn2_b"]))
    logits = z @ all_ent.T + L["ent_bias"]

    # the reference's exact loss: BCELoss(sigmoid(x), y) (main.py:62)
    loss_t = F.binary_cross_entropy(torch.sigmoid(logits),
                                    torch.tensor(np.asarray(y)))
    loss_t.backward()
    np.testing.assert_allclose(our_val, float(loss_t.detach()), rtol=1e-5)

    got = {
        "x": gr.entity_embedding,
        "rel_emb": gr.relation_embedding,
        "etab": edge_table_to_reference_order(
            gr.edge_embeddings, g)[:, :cfg.gcn_in_dim],
        "in_w": gr.conv.in_weight, "out_w": gr.conv.out_weight,
        "loop_w": gr.conv.loop_weight, "rels_w": gr.conv.rels_weight,
        "loop_rel": gr.conv.loop_rel, "loop_edge": gr.conv.loop_edge,
        "bn_s": gr.conv.bn.scale, "bn_b": gr.conv.bn.bias,
        "conv_w": gr.decoder.conv_w,
        "bn0_s": gr.decoder.bn0.scale, "bn0_b": gr.decoder.bn0.bias,
        "bn1_s": gr.decoder.bn1.scale, "bn1_b": gr.decoder.bn1.bias,
        "bn2_s": gr.decoder.bn2.scale, "bn2_b": gr.decoder.bn2.bias,
        "fc_w": gr.decoder.fc_w, "fc_b": gr.decoder.fc_b,
        "ent_bias": gr.decoder.ent_bias,
    }
    for name, ours in got.items():
        want = leaves[name].grad.numpy()
        np.testing.assert_allclose(
            np.asarray(ours), want, rtol=2e-3, atol=1e-5,
            err_msg=f"gradient mismatch: {name}")


def test_multi_epoch_training_trajectory_matches_torch(toy, toy_cfg):
    """Multi-epoch TRAJECTORY parity vs a torch training loop.

    Single-step gradient parity (test above) cannot see the composition of
    Adam moments + global-norm clip + StepLR + BatchNorm running-stats drift
    over epochs (reference main.py:49-77,138-174,217-219).  This oracle runs
    the reference loop in torch — Adam(0.9, 0.999, eps=1e-8),
    clip_grad_norm_(1.0), StepLR stepped per epoch, train-mode BN with
    persistent running stats — for 4 dropout-free epochs on Toy and compares
    per-step losses, final parameter DELTAS (movement from init, the actual
    trajectory signal), and final BN running stats.
    """
    import torch
    import torch.nn.functional as F
    from kgc_gcn_tpu.data.batching import build_labels
    from kgc_gcn_tpu.data.graph import edge_table_to_reference_order
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import epoch_lr, make_optimizer

    ds, g, banks = toy
    # dropout-free (deterministic); lr_step_size=2 so StepLR actually fires
    # inside a 4-epoch run; lr large enough that parameters move visibly
    cfg = toy_cfg.replace(gcn_drop=0.0, conv_drop=0.0, hidden_drop=0.0,
                          feat_drop=0.0, batch_size=8, lr_step_size=2,
                          lr_gamma=0.9, learning_rate=5e-3, num_filter=2)
    n_epochs = 4
    N, R, E = ds.num_entity, ds.num_relation, ds.num_edge

    model = build_model(cfg, N, R, E, e_pad=g.e_pad)
    params0, state0 = model.init(jax.random.PRNGKey(3))
    params0, state0 = _randomize_bn(params0, state0, np.random.default_rng(5))
    host0 = jax.tree.map(np.asarray, (params0, state0))

    bank = banks["train"]
    B = cfg.batch_size
    steps = bank.n_queries // B                  # full batches only
    q_all = np.asarray(bank.queries)[: steps * B]
    l_all = np.asarray(bank.label_idx)[: steps * B]

    # ---- our loop: the production train step driven by a fixed batch plan
    tx = make_optimizer(cfg)
    trainer = Trainer(cfg, model, g, banks)
    params, state = jax.tree.map(jnp.asarray, host0)
    opt_state = tx.init(params)
    ones = jnp.ones((B,), jnp.float32)
    our_losses = []
    for epoch in range(1, n_epochs + 1):
        lr = jnp.float32(epoch_lr(cfg, epoch))
        for s in range(steps):
            q = jnp.asarray(q_all[s * B: (s + 1) * B])
            li = jnp.asarray(l_all[s * B: (s + 1) * B])
            params, state, opt_state, loss = trainer._train_step_jit(
                params, state, opt_state, g, lr, q, li, ones,
                jax.random.PRNGKey(0))     # dropout rates are 0 -> unused
            our_losses.append(float(loss))

    # ---- torch oracle (reference main.py:49-77 + Adam + clip + StepLR)
    p0, s0 = host0

    def t(a):
        return torch.tensor(np.asarray(a, np.float32)).requires_grad_()

    c, d = p0.conv, p0.decoder
    etab_ref = edge_table_to_reference_order(p0.edge_embeddings, g)[:, : cfg.gcn_in_dim]
    L = {
        "x": t(p0.entity_embedding), "rel_emb": t(p0.relation_embedding),
        "etab": t(etab_ref),
        "in_w": t(c.in_weight), "out_w": t(c.out_weight),
        "loop_w": t(c.loop_weight), "rels_w": t(c.rels_weight),
        "loop_rel": t(c.loop_rel), "loop_edge": t(c.loop_edge),
        "bn_s": t(c.bn.scale), "bn_b": t(c.bn.bias),
        "conv_w": t(d.conv_w),
        "bn0_s": t(d.bn0.scale), "bn0_b": t(d.bn0.bias),
        "bn1_s": t(d.bn1.scale), "bn1_b": t(d.bn1.bias),
        "bn2_s": t(d.bn2.scale), "bn2_b": t(d.bn2.bias),
        "fc_w": t(d.fc_w), "fc_b": t(d.fc_b), "ent_bias": t(d.ent_bias),
    }
    # persistent running stats (F.batch_norm updates them in place)
    rs = {k: torch.tensor(np.asarray(v, np.float32))
          for k, v in (("bn_m", s0.conv_bn.mean), ("bn_v", s0.conv_bn.var),
                       ("bn0_m", s0.decoder.bn0.mean), ("bn0_v", s0.decoder.bn0.var),
                       ("bn1_m", s0.decoder.bn1.mean), ("bn1_v", s0.decoder.bn1.var),
                       ("bn2_m", s0.decoder.bn2.mean), ("bn2_v", s0.decoder.bn2.var))}

    tri = ds.train_triples
    s_, r_, o_ = (torch.tensor(tri[:, i].astype(np.int64)) for i in range(3))

    def ref_norm(row, col):
        deg = torch.zeros(N).index_add(0, row, torch.ones(len(row)))
        dinv = torch.where(deg > 0, deg.pow(-0.5), torch.zeros(()))
        return dinv[row] * dinv[col]

    in_norm, out_norm = ref_norm(s_, o_), ref_norm(o_, s_)

    def forward(src, rel):
        rels_full = torch.cat([L["rel_emb"], L["loop_rel"]], dim=0)
        in_m = ((L["x"][s_] * rels_full[r_] * L["etab"][:E]) @ L["in_w"]
                ) * in_norm[:, None]
        in_res = torch.zeros(N, cfg.gcn_out_dim).index_add(0, o_, in_m)
        out_m = ((L["x"][o_] * rels_full[r_ + R] * L["etab"][E:]) @ L["out_w"]
                 ) * out_norm[:, None]
        out_res = torch.zeros(N, cfg.gcn_out_dim).index_add(0, s_, out_m)
        loop_res = (L["x"] * L["loop_rel"] * L["loop_edge"]) @ L["loop_w"]
        h = (in_res + out_res + loop_res) / 3.0
        h = F.batch_norm(h, rs["bn_m"], rs["bn_v"], weight=L["bn_s"],
                         bias=L["bn_b"], training=True)
        all_ent = torch.tanh(h)
        all_rel = (rels_full @ L["rels_w"])[:-1]

        se, re = all_ent[src], all_rel[rel]
        stack = torch.cat([se.view(-1, 1, cfg.gcn_out_dim),
                           re.view(-1, 1, cfg.gcn_out_dim)], dim=1)
        img = stack.transpose(2, 1).reshape(-1, 1, 2 * cfg.k_w, cfg.k_h)
        z = F.batch_norm(img, rs["bn0_m"], rs["bn0_v"], weight=L["bn0_s"],
                         bias=L["bn0_b"], training=True)
        z = F.conv2d(z, L["conv_w"])
        z = F.batch_norm(z, rs["bn1_m"], rs["bn1_v"], weight=L["bn1_s"],
                         bias=L["bn1_b"], training=True)
        z = torch.relu(z).reshape(len(src), -1)
        z = z @ L["fc_w"].T + L["fc_b"]
        z = F.batch_norm(z, rs["bn2_m"], rs["bn2_v"], weight=L["bn2_s"],
                         bias=L["bn2_b"], training=True)
        z = torch.relu(z)
        return z @ all_ent.T + L["ent_bias"]

    opt = torch.optim.Adam(list(L.values()), lr=cfg.learning_rate,
                           betas=(0.9, 0.999), eps=1e-8)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=cfg.lr_step_size, gamma=cfg.lr_gamma)
    torch_losses = []
    for epoch in range(1, n_epochs + 1):
        for s in range(steps):
            src = torch.tensor(q_all[s * B: (s + 1) * B, 0].astype(np.int64))
            rel = torch.tensor(q_all[s * B: (s + 1) * B, 1].astype(np.int64))
            y = torch.tensor(np.asarray(build_labels(
                jnp.asarray(l_all[s * B: (s + 1) * B]), N, cfg.lbl_smooth)))
            opt.zero_grad()
            logits = forward(src, rel)
            loss = F.binary_cross_entropy(torch.sigmoid(logits), y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(list(L.values()), cfg.clip_grad)
            opt.step()
            torch_losses.append(float(loss.detach()))
        sched.step()

    # per-step losses track through all epochs (composition of optimizer,
    # clip, lr schedule, and BN running-stats drift)
    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-4)

    # final parameter MOVEMENT from init matches (the trajectory itself)
    ours_final = {
        "x": params.entity_embedding, "rel_emb": params.relation_embedding,
        "etab": edge_table_to_reference_order(
            params.edge_embeddings, g)[:, : cfg.gcn_in_dim],
        "in_w": params.conv.in_weight, "out_w": params.conv.out_weight,
        "loop_w": params.conv.loop_weight, "rels_w": params.conv.rels_weight,
        "loop_rel": params.conv.loop_rel, "loop_edge": params.conv.loop_edge,
        "bn_s": params.conv.bn.scale, "bn_b": params.conv.bn.bias,
        "conv_w": params.decoder.conv_w,
        # fc_b is EXCLUDED: it feeds straight into BN2, which cancels any
        # per-feature constant exactly — its true gradient is ~0 and Adam
        # normalizes the float-noise residual into +-lr-sized steps with
        # arbitrary signs on both sides (a degenerate direction with zero
        # effect on the model function; the reference has the same property)
        "fc_w": params.decoder.fc_w,
        "ent_bias": params.decoder.ent_bias,
    }
    init_vals = {
        "x": p0.entity_embedding, "rel_emb": p0.relation_embedding,
        "etab": etab_ref,
        "in_w": c.in_weight, "out_w": c.out_weight,
        "loop_w": c.loop_weight, "rels_w": c.rels_weight,
        "loop_rel": c.loop_rel, "loop_edge": c.loop_edge,
        "bn_s": c.bn.scale, "bn_b": c.bn.bias, "conv_w": d.conv_w,
        "fc_w": d.fc_w, "ent_bias": d.ent_bias,
    }
    for name, ours in ours_final.items():
        want = L[name].detach().numpy() - np.asarray(init_vals[name])
        got = np.asarray(ours) - np.asarray(init_vals[name])
        scale = max(np.abs(want).max(), 1e-8)
        np.testing.assert_allclose(
            got, want, rtol=0.05, atol=0.02 * scale,
            err_msg=f"trajectory delta mismatch: {name}")

    # BN running stats drifted identically
    np.testing.assert_allclose(np.asarray(state.conv_bn.mean),
                               rs["bn_m"].numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.conv_bn.var),
                               rs["bn_v"].numpy(), rtol=1e-3, atol=1e-4)
    # (decoder-side running stats are NOT compared: this architecture has
    # exactly-degenerate directions — fc_b feeds straight into BN2, and bn0's
    # scalar affine is fully canceled by BN1 since a VALID conv of the
    # 1-channel image shifts/scales every output channel uniformly.  Adam
    # noise-walks those parameters on both sides and bn1/bn2 running stats
    # EMA-absorb their histories; the model FUNCTION is invariant, which the
    # per-step loss comparison above already pins.  The reference model has
    # the same property.)


def test_mgcn_multilayer_depth(toy, toy_cfg):
    """num_layers>1 (framework depth extension): shapes, gradient flow, and
    pallas/plain agreement; single-layer behavior is unchanged by the fields."""
    from kgc_gcn_tpu.ops.losses import bce_with_logits

    ds, g, _ = toy
    cfg2 = toy_cfg.replace(num_layers=2)
    m2 = build_model(cfg2, ds.num_entity, ds.num_relation, ds.num_edge,
                     e_pad=g.e_pad)
    params, state = m2.init(jax.random.PRNGKey(0))
    assert len(params.extra_convs) == 1
    assert params.extra_convs[0].in_weight.shape == (32, 32)
    assert params.extra_edge_embeddings[0].shape == (2, g.e_pad, 32)

    src = jnp.asarray([0, 1], jnp.int32)
    rel = jnp.asarray([0, 1], jnp.int32)
    logits, ns = m2.apply(params, state, g, src, rel, train=True,
                          rng=jax.random.PRNGKey(1))
    assert logits.shape == (2, ds.num_entity)
    assert len(ns.extra_bn) == 1
    assert not np.allclose(np.asarray(ns.extra_bn[0].mean),
                           np.asarray(state.extra_bn[0].mean))

    # gradient reaches the depth-layer parameters
    y = jnp.zeros((2, ds.num_entity)).at[:, 0].set(1.0)

    def loss(p):
        lg, _ = m2.apply(p, state, g, src, rel, train=True)
        return bce_with_logits(lg, y)

    gr = jax.grad(loss)(params)
    assert float(jnp.abs(gr.extra_convs[0].in_weight).sum()) > 0
    assert float(jnp.abs(gr.extra_edge_embeddings[0]).sum()) > 0

    # pallas path agrees with the plain XLA path at depth 2
    m2p = build_model(cfg2.replace(use_pallas=True), ds.num_entity,
                      ds.num_relation, ds.num_edge, e_pad=g.e_pad)
    l1, _ = m2.apply(params, state, g, src, rel, train=False)
    l2, _ = m2p.apply(params, state, g, src, rel, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError, match="num_layers"):
        build_model(cfg2.replace(edge_sample_size=4), ds.num_entity,
                    ds.num_relation, ds.num_edge, e_pad=g.e_pad)
