"""The sparse-label / fused-classifier losses must match the dense reference
path (build_labels + bce_with_logits) in value AND gradients — they are the
same math via the affine label split (ops/fused_loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgc_gcn_tpu.data.batching import build_labels
from kgc_gcn_tpu.ops.fused_loss import fused_score_bce, sparse_bce_with_logits
from kgc_gcn_tpu.ops.losses import bce_with_logits


def _rand_problem(seed, b=6, n=37, lw=4, d=16):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(b, d)).astype(np.float32)
    ent = rng.normal(size=(n, d)).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32) * 0.1
    # unique label ids per row, padded with n
    label_idx = np.full((b, lw), n, np.int32)
    for i in range(b):
        k = rng.integers(1, lw + 1)
        label_idx[i, :k] = rng.choice(n, size=k, replace=False)
    mask = np.ones((b,), np.float32)
    mask[-1] = 0.0
    return (jnp.asarray(h), jnp.asarray(ent), jnp.asarray(bias),
            jnp.asarray(label_idx), jnp.asarray(mask))


@pytest.mark.parametrize("smooth", [0.0, 0.1])
@pytest.mark.parametrize("use_mask", [False, True])
def test_sparse_bce_matches_dense(smooth, use_mask):
    h, ent, bias, label_idx, mask = _rand_problem(0)
    n = ent.shape[0]
    logits = h @ ent.T + bias[None, :]
    m = mask if use_mask else None

    dense = bce_with_logits(logits, build_labels(label_idx, n, smooth), m)
    sparse = sparse_bce_with_logits(logits, label_idx, smooth, m)
    np.testing.assert_allclose(float(sparse), float(dense), rtol=1e-6)

    g_dense = jax.grad(
        lambda x: bce_with_logits(x, build_labels(label_idx, n, smooth), m)
    )(logits)
    g_sparse = jax.grad(
        lambda x: sparse_bce_with_logits(x, label_idx, smooth, m))(logits)
    np.testing.assert_allclose(np.asarray(g_sparse), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("smooth", [0.0, 0.1])
def test_fused_score_bce_matches_dense(smooth):
    h, ent, bias, label_idx, mask = _rand_problem(1)
    n = ent.shape[0]

    def dense_loss(h_, ent_, bias_):
        logits = h_ @ ent_.T + bias_[None, :]
        return bce_with_logits(logits, build_labels(label_idx, n, smooth), mask)

    def fused_loss(h_, ent_, bias_):
        return fused_score_bce(h_, ent_, bias_, label_idx, smooth, mask,
                               interpret=True)

    np.testing.assert_allclose(float(fused_loss(h, ent, bias)),
                               float(dense_loss(h, ent, bias)), rtol=1e-5)

    gd = jax.grad(dense_loss, argnums=(0, 1, 2))(h, ent, bias)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(h, ent, bias)
    for a, b, name in zip(gf, gd, ("dh", "dent", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7, err_msg=name)


def test_fused_score_bce_batch_padding():
    """Batch sizes off the sublane multiple are padded internally."""
    h, ent, bias, label_idx, mask = _rand_problem(2, b=5)
    n = ent.shape[0]
    logits = h @ ent.T + bias[None, :]
    dense = bce_with_logits(logits, build_labels(label_idx, n, 0.1), mask)
    fused = fused_score_bce(h, ent, bias, label_idx, 0.1, mask, interpret=True)
    np.testing.assert_allclose(float(fused), float(dense), rtol=1e-5)


def test_fused_score_bce_tile_boundary():
    """n_ent smaller than one tile and not a multiple of 128."""
    h, ent, bias, label_idx, mask = _rand_problem(3, b=8, n=150, d=8)
    logits = h @ ent.T + bias[None, :]
    dense = bce_with_logits(logits, build_labels(label_idx, 150, 0.1), mask)
    fused = fused_score_bce(h, ent, bias, label_idx, 0.1, mask, interpret=True)
    np.testing.assert_allclose(float(fused), float(dense), rtol=1e-5)


@pytest.mark.parametrize("impl", ["sparse", "fused"])
def test_trainer_loss_impl_matches_dense(impl, toy, toy_cfg):
    """Two full training epochs: sparse/fused trainers reproduce dense losses."""
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    ds, graph, banks = toy

    def run(loss_impl):
        cfg = toy_cfg.replace(loss_impl=loss_impl, lbl_smooth=0.1)
        model = build_model(cfg, ds.num_entity, ds.num_relation,
                            ds.num_edge, e_pad=graph.e_pad)
        trainer = Trainer(cfg, model, graph, banks)
        assert trainer.loss_impl == loss_impl
        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = make_optimizer(cfg).init(params)
        host = np.random.default_rng(0)
        losses = []
        for epoch in (1, 2):
            params, state, opt_state, loss = trainer.train_epoch(
                params, state, opt_state, epoch, host,
                jax.random.PRNGKey(epoch))
            losses.append(loss)
        return losses

    ref = run("dense")
    got = run(impl)
    np.testing.assert_allclose(got, ref, rtol=5e-5)
