"""Pallas SpMM kernel tests (interpret mode on CPU): forward vs segment_sum,
custom VJP vs autodiff of the plain path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgc_gcn_tpu.ops.scatter import aggregate_half
from kgc_gcn_tpu.ops.spmm_pallas import aggregate_half_pallas, segment_sum_pallas


def _interp():
    return jax.default_backend() != "tpu"


def test_segment_sum_pallas_matches_xla(toy):
    ds, g, _ = toy
    rng = np.random.default_rng(0)
    e = int(g.inb.src.shape[0])
    msg = jnp.asarray(rng.normal(size=(e, 8)).astype(np.float32))
    out = segment_sum_pallas(msg, g.inb.dst, g.inb.indptr, ds.num_entity,
                             interpret=_interp())
    expect = jax.ops.segment_sum(msg, g.inb.dst, num_segments=ds.num_entity)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_segment_sum_pallas_empty_and_hub_rows():
    """Rows with zero edges and a hub row spanning many chunks."""
    rng = np.random.default_rng(1)
    n, d = 40, 16
    # hub: row 7 gets 700 edges (multiple TILE_E chunks); rows 0-3 get none
    dst = np.sort(np.concatenate([
        np.full(700, 7), rng.integers(8, n, size=300)])).astype(np.int32)
    e = len(dst)
    indptr = np.zeros(n + 1, np.int32)
    indptr[1:] = np.cumsum(np.bincount(dst, minlength=n))
    msg = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    out = segment_sum_pallas(msg, jnp.asarray(dst), jnp.asarray(indptr), n,
                             interpret=_interp())
    expect = jax.ops.segment_sum(msg, jnp.asarray(dst), num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out[:4]), 0.0)


def test_aggregate_half_pallas_forward(toy):
    ds, g, _ = toy
    rng = np.random.default_rng(2)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
    ours = aggregate_half_pallas(x, rel, et, g.inb, ds.num_entity, _interp())
    ref = aggregate_half(x, rel, et, g.inb, ds.num_entity)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_aggregate_half_pallas_gradients(toy):
    """Custom VJP == autodiff through the plain segment-sum path."""
    ds, g, _ = toy
    rng = np.random.default_rng(3)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    def loss_pallas(x, rel, et):
        return jnp.sum(
            aggregate_half_pallas(x, rel, et, g.outb, ds.num_entity, _interp()) * w)

    def loss_plain(x, rel, et):
        return jnp.sum(aggregate_half(x, rel, et, g.outb, ds.num_entity) * w)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, rel, et)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, rel, et)
    for a, b, name in zip(g1, g2, ("x", "rel", "edge")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("rel_onehot", [False, True])
@pytest.mark.parametrize("variant", ["operands", "fwdw"])
def test_aggregate_half_bwd_perm_variants_match_contrib(toy, rel_onehot,
                                                        variant):
    """bwd_perm='operands' (src-order compose from static index arrays) and
    'fwdw' (permute the cotangent-independent w = rel*etab in the forward) ==
    bwd_perm='contrib' (permute the composed product) for every gradient,
    both halves."""
    ds, g, _ = toy
    rng = np.random.default_rng(17)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    for half in (g.inb, g.outb):
        et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))

        def loss(bp):
            def f(x, rel, et):
                return jnp.sum(aggregate_half_pallas(
                    x, rel, et, half, ds.num_entity, _interp(),
                    rel_onehot=rel_onehot, bwd_perm=bp) * w)
            return f

        g1 = jax.grad(loss(variant), argnums=(0, 1, 2))(x, rel, et)
        g2 = jax.grad(loss("contrib"), argnums=(0, 1, 2))(x, rel, et)
        for a, b, name in zip(g1, g2, ("x", "rel", "edge")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=name)


def test_aggregate_stacked_xla_matches_halves(toy):
    """One-launch XLA-precomposed stacked aggregation == per-half results,
    forward and every gradient (both tables' slices)."""
    from kgc_gcn_tpu.ops.scatter import aggregate_half
    from kgc_gcn_tpu.ops.spmm_pallas import aggregate_stacked_xla

    ds, g, _ = toy
    rng = np.random.default_rng(31)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et2 = jnp.asarray(rng.normal(size=(2 * g.e_pad, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    in_a, out_a = aggregate_stacked_xla(x, rel, et2, g.stacked,
                                        ds.num_entity, _interp())
    np.testing.assert_allclose(
        np.asarray(in_a),
        np.asarray(aggregate_half(x, rel, et2[: g.e_pad], g.inb,
                                  ds.num_entity)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_a),
        np.asarray(aggregate_half(x, rel, et2[g.e_pad:], g.outb,
                                  ds.num_entity)), rtol=1e-5, atol=1e-5)

    def loss_stacked(x, rel, et2):
        a, b = aggregate_stacked_xla(x, rel, et2, g.stacked, ds.num_entity,
                                     _interp())
        return jnp.sum(a * w) + jnp.sum(b * w * 0.5)

    def loss_plain(x, rel, et2):
        a = aggregate_half(x, rel, et2[: g.e_pad], g.inb, ds.num_entity)
        b = aggregate_half(x, rel, et2[g.e_pad:], g.outb, ds.num_entity)
        return jnp.sum(a * w) + jnp.sum(b * w * 0.5)

    g1 = jax.grad(loss_stacked, argnums=(0, 1, 2))(x, rel, et2)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, rel, et2)
    for a, b, nm in zip(g1, g2, ("x", "rel", "edge")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=nm)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_aggregate_fuzz_random_graphs(seed):
    """Kernel trust beyond the toy fixture: random entity/relation/edge
    counts (ragged vs the tile sizes, hub entities, empty rows, duplicate
    edges) — pallas forward + every gradient == the plain XLA path, both
    halves and the stacked both-halves kernel."""
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.ops.scatter import aggregate_half
    from kgc_gcn_tpu.ops.spmm_pallas import aggregate_stacked_pallas

    rng = np.random.default_rng(100 + seed)
    n_ent = int(rng.integers(5, 60))
    n_rel = int(rng.integers(1, 6))
    e = int(rng.integers(3, 200))
    d = int(rng.choice([4, 8, 16]))
    # skew sources toward a hub entity so some rows are heavy, some empty
    src = np.where(rng.random(e) < 0.3, 0, rng.integers(n_ent, size=e))
    tri = np.stack([src, rng.integers(n_rel, size=e),
                    rng.integers(n_ent, size=e)], axis=1).astype(np.int64)
    g = build_graph(tri, n_ent, n_rel, pad_to=8)

    x = jnp.asarray(rng.normal(size=(n_ent, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * n_rel + 1, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n_ent, d)).astype(np.float32))

    for half in (g.inb, g.outb):
        et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
        gp = jax.grad(lambda *a: jnp.sum(aggregate_half_pallas(
            *a, half, n_ent, _interp()) * w), argnums=(0, 1, 2))(x, rel, et)
        gr = jax.grad(lambda *a: jnp.sum(aggregate_half(
            *a, half, n_ent) * w), argnums=(0, 1, 2))(x, rel, et)
        for a, b, nm in zip(gp, gr, ("x", "rel", "edge")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5, err_msg=nm)

    et2 = jnp.asarray(rng.normal(
        size=(2 * g.e_pad, d)).astype(np.float32))
    in_a, out_a = aggregate_stacked_pallas(x, rel, et2, g.stacked, n_ent,
                                           _interp())
    ref_in = aggregate_half(x, rel, et2[: g.e_pad], g.inb, n_ent)
    ref_out = aggregate_half(x, rel, et2[g.e_pad:], g.outb, n_ent)
    np.testing.assert_allclose(np.asarray(in_a[:, :d]), np.asarray(ref_in),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a[:, :d]), np.asarray(ref_out),
                               rtol=2e-4, atol=1e-5)


def test_mgcn_with_pallas_matches_plain(toy, toy_cfg):
    from kgc_gcn_tpu.models import build_model
    ds, g, _ = toy
    m_plain = build_model(toy_cfg, ds.num_entity, ds.num_relation,
                          ds.num_edge, e_pad=g.e_pad)
    m_pallas = build_model(toy_cfg.replace(use_pallas=True), ds.num_entity,
                           ds.num_relation, ds.num_edge, e_pad=g.e_pad)
    params, state = m_plain.init(jax.random.PRNGKey(0))
    src = jnp.asarray([0, 1], jnp.int32)
    rel = jnp.asarray([0, 1], jnp.int32)
    l1, _ = m_plain.apply(params, state, g, src, rel, train=False)
    l2, _ = m_pallas.apply(params, state, g, src, rel, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)
    m_stacked = build_model(
        toy_cfg.replace(use_pallas=True, spmm_mode="stacked"),
        ds.num_entity, ds.num_relation, ds.num_edge, e_pad=g.e_pad)
    l3, _ = m_stacked.apply(params, state, g, src, rel, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l3),
                               rtol=1e-4, atol=1e-4)


def test_aggregate_stacked_pallas_matches_halves(toy):
    """Fused both-halves kernel == the two per-half aggregations, fwd + grads."""
    from kgc_gcn_tpu.ops.spmm_pallas import aggregate_stacked_pallas

    ds, g, _ = toy
    rng = np.random.default_rng(5)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(
        size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    # positionally-stored table (models/mgcn.py layout); the op lane-pads
    et = jnp.asarray(rng.normal(size=(2 * g.e_pad, d)).astype(np.float32))

    w_in = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    w_out = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    def loss_stacked(x, rel, et):
        ia, oa = aggregate_stacked_pallas(x, rel, et, g.stacked,
                                          ds.num_entity, _interp())
        return jnp.sum(ia[:, :d] * w_in) + jnp.sum(oa[:, :d] * w_out)

    def loss_plain(x, rel, et):
        ia = aggregate_half(x, rel, et[: g.e_pad], g.inb, ds.num_entity)
        oa = aggregate_half(x, rel, et[g.e_pad:], g.outb, ds.num_entity)
        return jnp.sum(ia * w_in) + jnp.sum(oa * w_out)

    np.testing.assert_allclose(
        float(loss_stacked(x, rel, et)), float(loss_plain(x, rel, et)),
        rtol=1e-5)
    g1 = jax.grad(loss_stacked, argnums=(0, 1, 2))(x, rel, et)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, rel, et)
    for a, b, name in zip(g1, g2, ("x", "rel", "edge")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_segment_sum_few_rel_sorted_kernel_path(toy, monkeypatch):
    """Large-relation-vocabulary d_rel route: rel-sorted Pallas segment-sum."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp

    ds, g, _ = toy
    rng = np.random.default_rng(11)
    d = 8
    n_seg = 2 * ds.num_relation + 1
    e = int(g.stacked.rel.shape[0])
    vals = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    ref = jax.ops.segment_sum(vals, g.stacked.rel, num_segments=n_seg)

    monkeypatch.setattr(sp, "ONEHOT_LIMIT", 0)   # force the large-vocab route
    out = sp._segment_sum_few(
        vals, g.stacked.rel, n_seg,
        rdata=(g.stacked.rperm, g.stacked.r_indptr, g.stacked.r_rel),
        interpret=_interp())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_aggregate_half_pallas_bf16_messages(toy):
    """bf16 message mode: forward + grads track f32 within bf16 tolerance."""
    ds, g, _ = toy
    rng = np.random.default_rng(5)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    out16 = aggregate_half_pallas(x, rel, et, g.inb, ds.num_entity, _interp(),
                                  msg_dtype="bfloat16")
    out32 = aggregate_half_pallas(x, rel, et, g.inb, ds.num_entity, _interp())
    assert out16.dtype == jnp.float32          # f32 accumulation
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)

    def loss(msg_dtype):
        def f(x, rel, et):
            return jnp.sum(aggregate_half_pallas(
                x, rel, et, g.outb, ds.num_entity, _interp(),
                msg_dtype=msg_dtype) * w)
        return f

    g16 = jax.grad(loss("bfloat16"), argnums=(0, 1, 2))(x, rel, et)
    g32 = jax.grad(loss("float32"), argnums=(0, 1, 2))(x, rel, et)
    for a, b, name in zip(g16, g32, ("x", "rel", "edge")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2, err_msg=name)


def test_compose_msg_pad_matches_xla():
    """One-pass compose+pad kernel == XLA compose then pad (elementwise_pallas)."""
    from kgc_gcn_tpu.ops.elementwise_pallas import compose_msg_pad
    rng = np.random.default_rng(0)
    e, d = 256, 20
    xgn, rg, et = (jnp.asarray(rng.normal(size=(e, d)), jnp.float32)
                   for _ in range(3))
    out = compose_msg_pad(xgn, rg, et, 128, "float32", interpret=True)
    assert out.shape == (e, 128)
    np.testing.assert_allclose(np.asarray(out[:, :d]),
                               np.asarray(xgn * rg * et), rtol=1e-6)
    assert not np.asarray(out[:, d:]).any()

    bf = compose_msg_pad(xgn, rg, et, 128, "bfloat16", interpret=True)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf[:, :d], np.float32),
        np.asarray((xgn * rg * et).astype(jnp.bfloat16), np.float32))


def test_bwd_products_matches_xla():
    """Three-output backward products kernel == the three XLA fusions."""
    from kgc_gcn_tpu.ops.elementwise_pallas import bwd_products
    rng = np.random.default_rng(1)
    e, d = 512, 100
    gdn, xg, rg, et = (jnp.asarray(rng.normal(size=(e, d)), jnp.float32)
                       for _ in range(4))
    contrib, drel, detab = bwd_products(gdn, xg, rg, et, "float32",
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(contrib), np.asarray(gdn * rg * et),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(drel), np.asarray(gdn * xg * et),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(detab), np.asarray(gdn * xg * rg),
                               rtol=1e-6)


def test_aggregate_half_ew_pallas_matches_xla_interpret():
    """Full per-half aggregation fwd+grads: ew-pallas kernels == XLA compose.

    interpret mode skips the kernels inside _aggregate_cvjp, so drive the
    kernels directly by comparing against the plain XLA reference aggregation
    on a tile-aligned synthetic half.
    """
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.ops.elementwise_pallas import compose_msg_pad, bwd_products

    rng = np.random.default_rng(2)
    n_ent, n_rel, e = 64, 5, 128
    tri = np.stack([rng.integers(n_ent, size=e),
                    rng.integers(n_rel, size=e),
                    rng.integers(n_ent, size=e)], 1).astype(np.int64)
    g = build_graph(tri, n_ent, n_rel, pad_to=128)
    h = g.inb
    x = jnp.asarray(rng.normal(size=(n_ent, 16)), jnp.float32)
    rel_all = jnp.asarray(rng.normal(size=(2 * n_rel + 1, 16)), jnp.float32)
    et = jnp.asarray(rng.normal(size=(g.e_pad, 16)), jnp.float32)

    xgn = x[h.src] * h.norm[:, None]
    rg = rel_all[h.rel]
    msg_k = compose_msg_pad(xgn, rg, et, 128, "float32", interpret=True)
    msg_x = (x[h.src] * rg * et) * h.norm[:, None]
    np.testing.assert_allclose(np.asarray(msg_k[:, :16]), np.asarray(msg_x),
                               rtol=1e-5, atol=1e-6)

    gd = jnp.asarray(rng.normal(size=(n_ent, 16)), jnp.float32)[h.dst] \
        * h.norm[:, None]
    xg = x[h.src]
    c_k, dr_k, de_k = bwd_products(gd, xg, rg, et, "float32", interpret=True)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(gd * rg * et),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dr_k), np.asarray(gd * xg * et),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(de_k), np.asarray(gd * xg * rg),
                               rtol=1e-5, atol=1e-6)


def test_aggregate_half_pallas_bf16_cast_post(toy, monkeypatch):
    """BF16_CAST='post' (permute the backward contrib in f32, cast after —
    the FB15k stacked_xla bf16 fix, BENCH_NOTES round 3): grads stay within
    bf16 tolerance of f32, and at least as close as the 'pre' variant."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    ds, g, _ = toy
    rng = np.random.default_rng(9)
    d = 8
    x = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))
    rel = jnp.asarray(
        rng.normal(size=(2 * ds.num_relation + 1, d)).astype(np.float32))
    et = jnp.asarray(rng.normal(size=(g.e_pad, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(ds.num_entity, d)).astype(np.float32))

    def grads(msg_dtype):
        def f(x, rel, et):
            return jnp.sum(aggregate_half_pallas(
                x, rel, et, g.inb, ds.num_entity, _interp(),
                msg_dtype=msg_dtype) * w)
        return jax.grad(f, argnums=(0, 1, 2))(x, rel, et)

    g32 = grads("float32")
    monkeypatch.setattr(sp, "BF16_CAST", "post")
    g_post = grads("bfloat16")
    monkeypatch.setattr(sp, "BF16_CAST", "pre")
    g_pre = grads("bfloat16")
    for a, b, name in zip(g_post, g32, ("x", "rel", "edge")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2, err_msg=name)
    # d_x error vs f32: post permutes in f32 then casts — never worse
    err_post = float(jnp.abs(g_post[0] - g32[0]).max())
    err_pre = float(jnp.abs(g_pre[0] - g32[0]).max())
    assert err_post <= err_pre + 1e-6, (err_post, err_pre)


def test_segment_max_sorted_matches_xla():
    """CSR max kernel vs jax.ops.segment_max: empty segments (-inf identity),
    a hub row spanning multiple TILE_E chunks, -inf masked edges, and narrow
    head counts that need sublane padding."""
    from kgc_gcn_tpu.ops.spmm_pallas import segment_max_sorted
    rng = np.random.default_rng(3)
    n, h = 40, 4
    dst = np.sort(np.concatenate([
        np.full(700, 7), rng.integers(8, n, size=300)])).astype(np.int32)
    e = len(dst)
    indptr = np.zeros(n + 1, np.int32)
    indptr[1:] = np.cumsum(np.bincount(dst, minlength=n))
    logits = rng.normal(size=(e, h)).astype(np.float32)
    # a fully-masked segment (all its edges -inf, like RGAT padding edges)
    logits[dst == 9] = -np.inf
    out = segment_max_sorted(jnp.asarray(logits), jnp.asarray(dst),
                             jnp.asarray(indptr), n,
                             interpret=_interp())
    expect = jax.ops.segment_max(jnp.asarray(logits), jnp.asarray(dst),
                                 num_segments=n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)
    assert np.all(np.isneginf(np.asarray(out[:4])))   # empty segments


def test_rgat_segment_softmax_kernel_max_path(toy, monkeypatch):
    """segment_softmax with the kernel max equals the XLA-max path exactly
    (the max only shifts; the softmax value is invariant)."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    from kgc_gcn_tpu.models.rgat import segment_softmax
    ds, g, _ = toy
    rng = np.random.default_rng(4)
    e = int(g.inb.src.shape[0])
    logits = jnp.asarray(rng.normal(size=(e, 4)).astype(np.float32))
    logits = jnp.where(g.inb.norm[:, None] > 0, logits, -jnp.inf)
    monkeypatch.setattr(sp, "ATTN_MAX", "xla")
    ref = segment_softmax(logits, g.inb.dst, ds.num_entity,
                          indptr=g.inb.indptr, use_pallas=True,
                          interpret=_interp())
    monkeypatch.setattr(sp, "ATTN_MAX", "pallas")
    ours = segment_softmax(logits, g.inb.dst, ds.num_entity,
                           indptr=g.inb.indptr, use_pallas=True,
                           interpret=_interp())
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_basis_fused_band_backward_matches_fallback(toy, monkeypatch):
    """basis_aggregate_fused: the dst-tile band backward (plan path) ==
    the XLA-contraction fallback (plan=None) == autodiff of the plain
    segment-sum formulation — forward and d_x/d_coeff.  Pinned to the
    'slice' pad ABI (d-width output); 'through' is covered by
    test_basis_pad_through_matches_slice at the model level."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    from kgc_gcn_tpu.ops.spmm_pallas import (
        basis_aggregate_fused, build_basis_bwd_plan)
    monkeypatch.setattr(sp, "BASIS_PAD", "slice")
    ds, g, _ = toy
    rng = np.random.default_rng(11)
    d, nb = 8, 3
    n = ds.num_entity
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    coeff = jnp.asarray(
        rng.normal(size=(2 * ds.num_relation, nb)).astype(np.float32))
    half = g.inb
    plan_arrays, plan_meta_ = build_basis_bwd_plan(half, n)
    plan = plan_arrays + plan_meta_          # kept flat for the run() split
    w = jnp.asarray(rng.normal(size=(n, nb, d)).astype(np.float32))

    def run(plan_arrays, plan_meta):
        def f(xv, cv):
            agg = basis_aggregate_fused(
                xv, cv, half.src, half.dst, half.rel, half.norm,
                half.indptr, half.sperm, half.s_indptr, half.s_src,
                (half.rperm, half.r_indptr, half.r_rel), plan_arrays,
                n, nb, True, plan_meta)
            return jnp.sum(agg * w), agg
        (_, agg), grads = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(x, coeff)
        return agg, grads

    def oracle():
        def f(xv, cv):
            a = cv[half.rel]
            msg = xv[half.src] * half.norm[:, None]
            agg = jax.ops.segment_sum(
                msg[:, None, :] * a[:, :, None], half.dst, num_segments=n,
                indices_are_sorted=True)
            return jnp.sum(agg * w), agg
        (_, agg), grads = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(x, coeff)
        return agg, grads

    agg_b, g_b = run(plan_arrays, plan_meta_)
    agg_f, g_f = run(None, None)
    agg_o, g_o = oracle()
    for got, name in ((agg_b, "band agg"), (agg_f, "fallback agg")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(agg_o),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
    for got, ref, name in ((g_b, g_o, "band"), (g_f, g_o, "fallback")):
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"{name} d_x")
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"{name} d_coeff")


@pytest.mark.parametrize("variant", ["da_matmul", "v3d", "tree", "tree_da_matmul", "aexp_da_matmul"])
def test_basis_band_backward_variant_matches(toy, monkeypatch, variant):
    """The numerics-equivalent band-backward schedule variants (round 5:
    'da_matmul' = d_a via the hi/lo MXU block-indicator matmul; 'v3d' = one
    3D view reduced over basis/lane dims for d_msg/d_a) == the column-store
    schedule — d_x and d_coeff."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    from kgc_gcn_tpu.ops.spmm_pallas import (
        basis_aggregate_fused, build_basis_bwd_plan)
    ds, g, _ = toy
    rng = np.random.default_rng(13)
    d, nb = 8, 3
    n = ds.num_entity
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    coeff = jnp.asarray(
        rng.normal(size=(2 * ds.num_relation, nb)).astype(np.float32))
    half = g.inb
    monkeypatch.setattr(sp, "BASIS_PAD", "slice")   # d-width kernel ABI
    plan_arrays, plan_meta_ = build_basis_bwd_plan(half, n)
    w = jnp.asarray(rng.normal(size=(n, nb, d)).astype(np.float32))

    def grads():
        def f(xv, cv):
            agg = basis_aggregate_fused(
                xv, cv, half.src, half.dst, half.rel, half.norm,
                half.indptr, half.sperm, half.s_indptr, half.s_src,
                (half.rperm, half.r_indptr, half.r_rel), plan_arrays,
                n, nb, True, plan_meta_)
            return jnp.sum(agg * w)
        return jax.grad(f, argnums=(0, 1))(x, coeff)

    monkeypatch.setattr(sp, "BASIS_BWD_VARIANT", "full")
    g_full = grads()
    monkeypatch.setattr(sp, "BASIS_BWD_VARIANT", variant)
    g_mm = grads()
    for a, b, name in zip(g_mm, g_full, ("d_x", "d_coeff")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("fv", ["v3d", "aexp"])
def test_basis_fwd_variant_matches(toy, monkeypatch, fv):
    """KGC_BASIS_FWD_VARIANT=v3d (one 3D expansion + one hi/lo matmul pair
    for the whole out block) == the per-basis loop schedule — forward
    aggregation values."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    ds, g, _ = toy
    rng = np.random.default_rng(17)
    d, nb = 8, 3
    n = ds.num_entity
    half = g.inb
    msg = jnp.asarray(rng.normal(size=(half.src.shape[0], d))
                      .astype(np.float32))
    a = jnp.asarray(rng.normal(size=(half.src.shape[0], nb))
                    .astype(np.float32))
    out_loop = sp._basis_fused_call(msg, a, half.dst, half.indptr, n, nb,
                                    True, "loop")
    out_v3d = sp._basis_fused_call(msg, a, half.dst, half.indptr, n, nb,
                                   True, fv)
    # v3d expands the coefficient through its own bf16 hi/lo split (the
    # loop splits the composed product instead) — agreement is to hi/lo
    # double precision (~1.5e-5 relative), same as the kernel-vs-XLA gates
    np.testing.assert_allclose(np.asarray(out_v3d), np.asarray(out_loop),
                               rtol=2e-4, atol=5e-5)


def test_basis_pad_through_matches_slice(toy, monkeypatch):
    """KGC_BASIS_PAD=through (lane padding carried through the layer: padded
    table gathers, padded kernel output, zero basis rows in the caller's
    einsum) == the slice-at-the-boundary layout — values and d_x/d_coeff,
    through the full RGCN encode."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.models import build_model

    ds, g, _ = toy
    cfg = dataset_preset("Toy", gcn_in_dim=8, gcn_out_dim=32, k_w=4, k_h=8,
                         num_filter=4, kernel_size=3, model="rgcn",
                         decoder="distmult", num_bases=3, use_pallas=True)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    model.prepare_kernels(g)
    params, state = model.init(jax.random.PRNGKey(0))

    def val_and_grad():
        def f(p):
            ae, ar, _ = model.encode(p, state, g)
            return jnp.sum(ae * jnp.cos(jnp.arange(ae.shape[1])))
        v, gr = jax.value_and_grad(f)(params)
        return (np.asarray(v), np.asarray(gr.entity_embedding),
                np.asarray(gr.layers[0].coeff),
                np.asarray(gr.layers[0].basis))

    monkeypatch.setattr(sp, "BASIS_PAD", "slice")
    ref = val_and_grad()
    monkeypatch.setattr(sp, "BASIS_PAD", "through")
    got = val_and_grad()
    for a, b, name in zip(got, ref, ("val", "d_x", "d_coeff", "d_basis")):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=name)


def test_basis_readback_bf16_close_to_f32(toy, monkeypatch):
    """KGC_BASIS_READBACK=bf16 (opt-in: halve the s<->d permutation bytes)
    keeps d_x within bf16 rounding of the f32 path; d_coeff is untouched."""
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.models import build_model

    ds, g, _ = toy
    cfg = dataset_preset("Toy", gcn_in_dim=8, gcn_out_dim=32, k_w=4, k_h=8,
                         num_filter=4, kernel_size=3, model="rgcn",
                         decoder="distmult", num_bases=3, use_pallas=True)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    model.prepare_kernels(g)
    params, state = model.init(jax.random.PRNGKey(0))

    def grad_x():
        def f(p):
            ae, _, _ = model.encode(p, state, g)
            return jnp.sum(ae * jnp.cos(jnp.arange(ae.shape[1])))
        return np.asarray(jax.grad(f)(params).entity_embedding)

    monkeypatch.setattr(sp, "BASIS_READBACK", "wide")
    ref = grad_x()
    monkeypatch.setattr(sp, "BASIS_READBACK", "bf16")
    got = grad_x()
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2 * scale)
