"""On-device edge sampler: unbiasedness of the rescaled aggregation and the
sampled-training path."""

import numpy as np
import jax
import jax.numpy as jnp

from kgc_gcn_tpu.ops.sampler import aggregate_sampled_half, sample_half
from kgc_gcn_tpu.ops.scatter import aggregate_half


def test_sampled_aggregation_is_unbiased(toy):
    ds, g, _ = toy
    rng = np.random.default_rng(0)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(
        size=(g.e_pad, d)).astype(np.float32))   # in-half positional slice

    exact = np.asarray(aggregate_half(x, rel, et, g.inb, ds.num_entity))

    k = 32
    total = np.zeros_like(exact)
    reps = 600
    for i in range(reps):
        h = sample_half(jax.random.PRNGKey(i), g.inb, k, ds.num_edge)
        total += np.asarray(aggregate_sampled_half(x, rel, et, h, ds.num_entity))
    mean = total / reps
    # Monte-Carlo mean approaches the exact sum (loose tolerance: 600 reps)
    err = np.abs(mean - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 0.25, f"relative error {err}"


def test_sample_half_draws_only_real_edges(toy):
    ds, g, _ = toy
    h = sample_half(jax.random.PRNGKey(0), g.inb, 64, ds.num_edge)
    assert h.src.shape == (64,)
    # sampled norms are never the padding zeros
    assert float(jnp.min(jnp.abs(h.norm))) > 0.0


def test_mgcn_sampled_training_runs(toy, toy_cfg):
    from kgc_gcn_tpu.models import build_model
    ds, g, _ = toy
    cfg = toy_cfg.replace(edge_sample_size=16)
    m = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                    e_pad=g.e_pad)
    params, state = m.init(jax.random.PRNGKey(0))
    src = jnp.asarray([0, 1], jnp.int32)
    rel = jnp.asarray([0, 1], jnp.int32)
    logits, _ = m.apply(params, state, g, src, rel, train=True,
                        rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(logits)).all()
    # eval path ignores sampling (deterministic full-graph encode)
    l1, _ = m.apply(params, state, g, src, rel, train=False)
    cfg0 = toy_cfg.replace(edge_sample_size=0)
    m0 = build_model(cfg0, ds.num_entity, ds.num_relation, ds.num_edge,
                     e_pad=g.e_pad)
    l2, _ = m0.apply(params, state, g, src, rel, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
