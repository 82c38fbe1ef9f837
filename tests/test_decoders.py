"""Decoder family: full scoring vs naive formulas, candidate-scorer
consistency, trunk form (logits == h @ ent.T + bias), and end-to-end
train-step smoke for every decoder on the Toy fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgc_gcn_tpu.config import dataset_preset
from kgc_gcn_tpu.models.decoders import CANDIDATE_SCORERS, DECODERS, QUERY_TRUNKS


def _setup(decoder, d=8, n_ent=13, b=4):
    cfg = dataset_preset("Toy", gcn_out_dim=d, decoder=decoder,
                         k_w=2, k_h=4, num_filter=2, kernel_size=1)
    rng = np.random.default_rng(0)
    init, apply = DECODERS[decoder]
    params, state = init(jax.random.PRNGKey(0), cfg, n_ent)
    if hasattr(params, "ent_bias"):
        params = type(params)(**{
            **{f: getattr(params, f) for f in params.__dataclass_fields__},
            "ent_bias": jnp.asarray(rng.normal(size=n_ent), jnp.float32)})
    src = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    ent = jnp.asarray(rng.normal(size=(n_ent, d)), jnp.float32)
    return cfg, params, state, apply, src, rel, ent


def test_transe_matches_naive():
    cfg, params, state, apply, src, rel, ent = _setup("transe")
    logits, _ = apply(params, state, cfg, src, rel, ent, train=False)
    q = np.asarray(src) + np.asarray(rel)
    naive = -((q[:, None, :] - np.asarray(ent)[None]) ** 2).sum(-1) \
        + np.asarray(params.ent_bias)[None, :]
    np.testing.assert_allclose(np.asarray(logits), naive, rtol=1e-4, atol=1e-4)


def test_complex_matches_naive():
    cfg, params, state, apply, src, rel, ent = _setup("complex")
    logits, _ = apply(params, state, cfg, src, rel, ent, train=False)
    d = src.shape[1] // 2
    s = np.asarray(src[:, :d]) + 1j * np.asarray(src[:, d:])
    r = np.asarray(rel[:, :d]) + 1j * np.asarray(rel[:, d:])
    o = np.asarray(ent[:, :d]) + 1j * np.asarray(ent[:, d:])
    naive = np.real(np.einsum("bd,bd,nd->bn", s, r, o.conj())) \
        + np.asarray(params.ent_bias)[None, :]
    np.testing.assert_allclose(np.asarray(logits), naive, rtol=1e-4, atol=1e-4)


def test_rotate_matches_naive():
    """RotatE MXU expansion vs the naive complex-rotation distance."""
    cfg, params, state, apply, src, rel, ent = _setup("rotate")
    logits, _ = apply(params, state, cfg, src, rel, ent, train=False)
    d = src.shape[1] // 2
    s = np.asarray(src[:, :d]) + 1j * np.asarray(src[:, d:])
    r = np.exp(1j * np.asarray(rel[:, :d]))            # unit modulus
    o = np.asarray(ent[:, :d]) + 1j * np.asarray(ent[:, d:])
    naive = -(np.abs(s[:, None, :] * r[:, None, :] - o[None]) ** 2).sum(-1) \
        + np.asarray(params.ent_bias)[None, :]
    np.testing.assert_allclose(np.asarray(logits), naive, rtol=1e-4, atol=1e-4)


def test_rotate_rejects_odd_dim():
    cfg = dataset_preset("Toy", gcn_out_dim=7, decoder="rotate")
    with pytest.raises(ValueError, match="even"):
        DECODERS["rotate"][0](jax.random.PRNGKey(0), cfg, 5)


def test_complex_rejects_odd_dim():
    cfg = dataset_preset("Toy", gcn_out_dim=7, decoder="complex")
    with pytest.raises(ValueError, match="even"):
        DECODERS["complex"][0](jax.random.PRNGKey(0), cfg, 5)


@pytest.mark.parametrize("decoder", ["distmult", "transe", "complex",
                                     "rotate"])
def test_candidate_scores_match_full_logits(decoder):
    cfg, params, state, apply, src, rel, ent = _setup(decoder)
    logits, _ = apply(params, state, cfg, src, rel, ent, train=False)
    cand = jnp.asarray([[0, 5, 12], [1, 1, 3], [2, 7, 9], [4, 0, 11]],
                       jnp.int32)
    got, _ = CANDIDATE_SCORERS[decoder](
        params, state, cfg, src, rel, ent[cand], cand, train=False)
    want = jnp.take_along_axis(logits, cand, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("decoder", ["distmult", "complex"])
def test_trunk_matches_apply(decoder):
    """QUERY_TRUNKS contract: logits == h @ all_ent.T + ent_bias."""
    cfg, params, state, apply, src, rel, ent = _setup(decoder)
    logits, _ = apply(params, state, cfg, src, rel, ent, train=False)
    h, _ = QUERY_TRUNKS[decoder](params, state, cfg, src, rel, train=False)
    via_trunk = h @ ent.T + params.ent_bias[None, :]
    np.testing.assert_allclose(np.asarray(via_trunk), np.asarray(logits),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("decoder", ["transe", "complex", "rotate"])
def test_train_step_smoke(decoder, toy, toy_cfg):
    """One training epoch + eval runs and is finite for each new decoder
    (transe exercises the dense-loss fallback, complex the sparse trunk)."""
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    ds, graph, banks = toy
    cfg = toy_cfg.replace(decoder=decoder)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=graph.e_pad)
    trainer = Trainer(cfg, model, graph, banks)
    assert trainer.loss_impl == ("sparse" if decoder == "complex"
                                 else "dense")
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    params, state, opt_state, loss = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(0),
        jax.random.PRNGKey(1))
    assert np.isfinite(loss)
    res = trainer.evaluate(params, state, "valid")
    assert 0.0 < res["mrr"] <= 1.0


def test_conv_impls_agree():
    """All three ConvE convolution lowerings produce the same logits."""
    from kgc_gcn_tpu.models.decoders import conve_init, conve_apply

    outs = []
    for impl in ("im2col", "patches", "lax"):
        cfg = dataset_preset("Toy", gcn_out_dim=32, k_w=4, k_h=8,
                             num_filter=4, kernel_size=3, conv_impl=impl)
        params, state = conve_init(jax.random.PRNGKey(0), cfg, 9)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
        rel = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
        ent = jnp.asarray(rng.normal(size=(9, 32)), jnp.float32)
        logits, _ = conve_apply(params, state, cfg, src, rel, ent, train=False)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-4, atol=1e-4)
