"""Op-level tests: aggregation vs numpy scatter, fused BCE vs torch's
sigmoid+BCELoss, comparison-count ranking vs the double-argsort oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.ops.losses import bce_with_logits
from kgc_gcn_tpu.ops.ranking import combine_head_tail, filtered_ranks, rank_metrics
from kgc_gcn_tpu.ops.scatter import aggregate_half, loop_messages


def test_aggregate_half_matches_numpy(toy):
    ds, g, _ = toy
    rng = np.random.default_rng(0)
    d = 8
    x = rng.normal(size=(ds.num_entity, d)).astype(np.float32)
    rel_all = rng.normal(size=(2 * ds.num_relation + 1, d)).astype(np.float32)
    # per-half positional slice (models/mgcn.py table layout)
    etab = rng.normal(size=(g.e_pad, d)).astype(np.float32)

    out = np.asarray(aggregate_half(
        jnp.asarray(x), jnp.asarray(rel_all), jnp.asarray(etab),
        g.inb, ds.num_entity))

    expect = np.zeros((ds.num_entity, d), np.float32)
    src, dst, rel, norm = (np.asarray(a) for a in
                           (g.inb.src, g.inb.dst, g.inb.rel, g.inb.norm))
    for e in range(len(src)):
        if norm[e] == 0.0:
            continue  # padding
        expect[dst[e]] += x[src[e]] * rel_all[rel[e]] * etab[e] * norm[e]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_loop_messages_is_identity_scatter():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 4)).astype(np.float32)
    lr = rng.normal(size=(1, 4)).astype(np.float32)
    le = rng.normal(size=(1, 4)).astype(np.float32)
    out = np.asarray(loop_messages(jnp.asarray(x), jnp.asarray(lr), jnp.asarray(le)))
    np.testing.assert_allclose(out, x * lr * le, rtol=1e-6)


def test_bce_with_logits_matches_torch_reference():
    """Fused logits-space BCE == torch BCELoss(sigmoid(x), y) (model.py:22,179)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(scale=3.0, size=(6, 11)).astype(np.float32)
    y = (rng.random((6, 11)) < 0.3).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    theirs = float(torch.nn.BCELoss()(
        torch.sigmoid(torch.tensor(x)), torch.tensor(y)))
    assert abs(ours - theirs) < 1e-5


def test_bce_row_mask_matches_unpadded():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    y = (rng.random((4, 7)) < 0.5).astype(np.float32)
    full = float(bce_with_logits(jnp.asarray(x[:3]), jnp.asarray(y[:3])))
    masked = float(bce_with_logits(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray([1.0, 1.0, 1.0, 0.0])))
    assert abs(full - masked) < 1e-6


def test_filtered_ranks_hand_example():
    # 3 entities; scores [0.9, 0.5, 0.8]; gold = 1; entity 2 is known-true
    scores = jnp.asarray([[0.9, 0.5, 0.8]])
    ranks = filtered_ranks(scores, jnp.asarray([1]),
                           jnp.asarray([[2, 3]]))  # filter {2}, pad=3
    # after masking e2, only e0 (0.9) outranks gold (0.5) -> rank 2
    assert int(ranks[0]) == 2


def test_filtered_ranks_vs_double_argsort_oracle():
    """Comparison-count rank == reference double-argsort rank (main.py:122-126)
    when scores are distinct."""
    rng = np.random.default_rng(4)
    b, n, l = 16, 50, 5
    scores = rng.permutation(b * n).reshape(b, n).astype(np.float32)  # distinct
    obj = rng.integers(n, size=b)
    filt = np.full((b, l), n, np.int32)
    for i in range(b):
        known = rng.choice(n, size=rng.integers(1, l), replace=False)
        filt[i, :len(known)] = known

    ours = np.asarray(filtered_ranks(
        jnp.asarray(scores), jnp.asarray(obj), jnp.asarray(filt)))

    # oracle: reference main.py:123-126 in numpy
    pred = scores.copy()
    rows = np.arange(b)
    target = pred[rows, obj].copy()
    for i in range(b):
        for e in filt[i]:
            if e < n:
                pred[i, e] = -1e7
    pred[rows, obj] = target
    order = np.argsort(-pred, axis=1, kind="stable")
    rank_of = np.argsort(order, axis=1, kind="stable")
    oracle = 1 + rank_of[rows, obj]
    np.testing.assert_array_equal(ours, oracle)


def test_rank_metrics_and_combine():
    ranks = jnp.asarray([1, 3, 12])
    m = rank_metrics(ranks, jnp.ones(3))
    assert float(m["count"]) == 3
    assert float(m["mr"]) == 16
    assert abs(float(m["mrr"]) - (1 + 1/3 + 1/12)) < 1e-6
    assert float(m["hits@1"]) == 1 and float(m["hits@3"]) == 2
    assert float(m["hits@10"]) == 2
    tail = {k: float(v) for k, v in m.items()}
    res = combine_head_tail(tail, tail)
    assert res["mr"] == round(16 / 3, 5)
    assert res["hits@10"] == round(2 / 3, 5)


def test_rank_metrics_padding_ignored():
    ranks = jnp.asarray([1, 1])
    m = rank_metrics(ranks, jnp.asarray([1.0, 0.0]))
    assert float(m["count"]) == 1 and float(m["hits@1"]) == 1


def test_segment_sum_few_matches_scatter():
    """One-hot MXU formulation of the few-segment sum (d_rel backward)."""
    from kgc_gcn_tpu.ops.spmm_pallas import _segment_sum_few
    rng = np.random.default_rng(7)
    e, d, n_seg = 513, 12, 23
    vals = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32) * 10)
    ids = jnp.asarray(rng.integers(0, n_seg, size=e).astype(np.int32))
    out = _segment_sum_few(vals, ids, n_seg)
    ref = jax.ops.segment_sum(vals, ids, num_segments=n_seg)
    # hi/lo bf16 split: ~1e-6 relative per element; sums of ~20 terms land
    # within ~1e-3 absolute at these magnitudes
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)


def test_conve_im2col_matches_lax_conv():
    """im2col+matmul ConvE convolution == lax.conv, fwd and grads."""
    from kgc_gcn_tpu.models.decoders import _conv2d_c1_im2col
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(3, 1, 20, 20)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 1, 7, 7)).astype(np.float32))

    def ref_fn(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    ref = ref_fn(x, w)
    out = _conv2d_c1_im2col(x, w, "float32")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    g1 = jax.grad(lambda x, w: jnp.sum(jnp.tanh(
        _conv2d_c1_im2col(x, w, "float32"))), argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(jnp.tanh(ref_fn(x, w))),
                  argnums=(0, 1))(x, w)
    for a, b, name in zip(g1, g2, ("x", "w")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_ccorr_matches_naive():
    """Circular correlation via FFT == the O(d^2) definition (ops/scatter)."""
    from kgc_gcn_tpu.ops.scatter import _ccorr
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 8)).astype(np.float32)
    b = rng.normal(size=(3, 8)).astype(np.float32)
    got = np.asarray(_ccorr(jnp.asarray(a), jnp.asarray(b)))
    d = a.shape[1]
    want = np.zeros_like(a)
    for k in range(d):
        for i in range(d):
            want[:, k] += a[:, i] * b[:, (i + k) % d]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_compose_pair_variants():
    from kgc_gcn_tpu.ops.scatter import compose_pair
    import pytest
    x = jnp.ones((2, 4)) * 3.0
    r = jnp.ones((2, 4)) * 2.0
    np.testing.assert_allclose(np.asarray(compose_pair(x, r, "mult")), 6.0)
    np.testing.assert_allclose(np.asarray(compose_pair(x, r, "sub")), 1.0)
    with pytest.raises(ValueError):
        compose_pair(x, r, "bogus")


def test_self_adversarial_loss_matches_numpy_oracle():
    """RotatE self-adversarial objective vs a literal numpy transcription:
    -log sigma(g + s_pos) - sum_k softmax(a*s_k) log sigma(-s_k - g)."""
    from kgc_gcn_tpu.ops.losses import self_adversarial_loss

    rng = np.random.default_rng(3)
    pos = rng.normal(size=7).astype(np.float32)
    neg = rng.normal(size=(7, 5)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 1, 0, 0], np.float32)
    g, a = 2.0, 0.7

    def sigma(x):
        return 1.0 / (1.0 + np.exp(-x))

    w = np.exp(a * neg) / np.exp(a * neg).sum(axis=1, keepdims=True)
    per = -np.log(sigma(g + pos)) - (w * np.log(sigma(-neg - g))).sum(axis=1)
    want = (per * mask).sum() / mask.sum()
    got = float(self_adversarial_loss(
        jnp.asarray(pos), jnp.asarray(neg), g, a, jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # no mask: plain mean
    got_nm = float(self_adversarial_loss(jnp.asarray(pos), jnp.asarray(neg),
                                         g, a))
    np.testing.assert_allclose(got_nm, per.mean(), rtol=1e-5)


def test_self_adversarial_weights_are_constants():
    """The softmax weighting is stop-gradiented: the gradient wrt a negative
    logit equals w_k * sigma(s_k + g) (no softmax-jacobian term)."""
    from kgc_gcn_tpu.ops.losses import self_adversarial_loss

    pos = jnp.zeros((1,))
    neg = jnp.asarray([[0.5, -1.0]])
    g_, a_ = 1.0, 2.0
    grad = jax.grad(
        lambda n: self_adversarial_loss(pos, n, g_, a_))(neg)
    w = jax.nn.softmax(a_ * neg, axis=1)
    want = w * jax.nn.sigmoid(neg + g_)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want), rtol=1e-5)


def test_per_rel_combine_and_corpus_edge_cases():
    """combine_head_tail_by_rel NaNs empty relations; corpus_from_per_rel
    ignores them and reproduces combine_head_tail on the totals."""
    from kgc_gcn_tpu.ops.ranking import (combine_head_tail,
                                         combine_head_tail_by_rel,
                                         corpus_from_per_rel,
                                         rank_metric_sums_by_rel)

    rng = np.random.default_rng(5)
    n_rel, b = 4, 64
    ranks = jnp.asarray(rng.integers(1, 30, size=b))
    allowed = np.array([0, 1, 2, 4, 5, 6])      # nothing folds onto rel 3
    rels = jnp.asarray(rng.choice(allowed, size=b))
    mask = jnp.ones((b,))
    tail = rank_metric_sums_by_rel(ranks, rels, mask, n_rel)
    head = rank_metric_sums_by_rel(ranks, rels, mask, n_rel)
    per = combine_head_tail_by_rel(tail, head)
    assert np.isnan(per["mrr"][n_rel - 1])          # no queries -> NaN
    assert per["count"][n_rel - 1] == 0

    got = corpus_from_per_rel(per)
    want = combine_head_tail({k: float(np.asarray(v).sum())
                              for k, v in tail.items()},
                             {k: float(np.asarray(v).sum())
                              for k, v in head.items()})
    for k in want:
        assert abs(got[k] - want[k]) < 1e-4, (k, got[k], want[k])
