"""Per-kernel attribution of the RGCN basis step (round-4 verdict item 1).

The rgcn_pallas step at FB15k config 3 measured 45.7 ms with a ~17 ms
"pallas bucket" whose internal split (band backward kernel vs d_x kernel vs
forward kernel vs the operand gathers around them) the whole-step trace
cannot attribute.  This harness times each piece in an ISOLATED jitted
``lax.scan`` (BENCH_NOTES measurement rules: scan-amortize, sync via a host
scalar pull), so the pieces roughly add to the encoder's fwd+bwd cost:

  full          the bench.py rgcn_pallas step (fwd+bwd+Adam, K=64 sampling)
  enc_fb        encoder fwd+bwd (loss = sum of outputs)
  enc_f         encoder fwd only
  fwd_operands  msg = x[src]*norm and a = coeff[rel] gathers (both halves)
  fwd_kernel    _basis_fused_call alone (both halves)
  einsum        the (N,B,d)x(B,d,o) basis projections + self-connection
  bwd_operands  padded-order msgp/ap gathers + _pad_cols (both halves)
  bwd_band      _basis_bwd_call (the dst-tile band kernel) alone
  bwd_readback  dmsg_pad[sperm_pad][:, :d] * s_normp (the s<->d permutation)
  bwd_dx        segment_sum_pallas of the src-sorted contrib (d_x)
  bwd_dcoeff    _segment_sum_few of the masked d_a (d_coeff)

Tile knobs ride the module globals (KGC_BASIS_TILE_N / KGC_BASIS_TILE_E):
``python scripts/rgcn_profile.py kernels`` re-times only the kernel pieces,
which compile in seconds — the cheap way to sweep band-kernel tiles.

Usage: python scripts/rgcn_profile.py [all|kernels|band]
"""

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 50
REPS = 3


def timed(fn, *args):
    fn(*args)  # compile + warmup
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main(scope="all"):
    from kgc_gcn_tpu.utils.compile_cache import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.ops import spmm_pallas as sp
    from kgc_gcn_tpu.train.loop import root_key
    from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    if os.environ.get("KGC_RGCN_PROFILE_SMOKE") == "1":
        n_ent, n_rel, n_edge, batch = 50, 5, 300, 8
    else:
        n_ent, n_rel, n_edge, batch = 14541, 237, 272115, 128
    interp = os.environ.get("KGC_RGCN_PROFILE_SMOKE") == "1"
    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)

    cfg = dataset_preset(
        "FB15k-237", batch_size=batch, model="rgcn", decoder="distmult",
        num_bases=30, train_mode="negative_sampling", num_negatives=64,
        use_pallas=True, compute_dtype="float32", moment_dtype="float32")
    model = build_model(cfg, n_ent, n_rel, n_edge, e_pad=graph.e_pad)
    model.prepare_kernels(graph)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    layer = params.layers[0]
    n_b = model.nb
    d = cfg.gcn_in_dim
    d_pad = -(-d // 128) * 128
    key = jax.random.PRNGKey(1)
    results = {}
    halves = (graph.inb, graph.outb)
    plans = model._bwd_plans

    def scan(body, *arrs):
        @jax.jit
        def run(*a):
            out, _ = jax.lax.scan(
                lambda c, b: (body(c, b, *a), None), 0.0, jnp.arange(STEPS))
            return out
        return lambda: run(*arrs)

    only = {"band": ("bwd_band",),
            "readback": ("bwd_readback",),
            "kernels": ("fwd_kernel", "bwd_band")}.get(scope)

    def want(name):
        return only is None or name in only

    # ---- kernel/operand pieces (small programs — compile in seconds)
    def fwd_operands(c, b):
        x = params.entity_embedding + c
        for h in halves:
            msg = x[h.src] * h.norm[:, None]
            a = layer.coeff[h.rel]
            c = c + msg[0, 0] + a[0, 0]
        return c
    if want("fwd_operands"):
        results["fwd_operands"] = timed(scan(fwd_operands))

    # fixed operands for the kernel-only scans
    fixed = []
    for h in halves:
        msg = np.asarray(params.entity_embedding)[np.asarray(h.src)] \
            * np.asarray(h.norm)[:, None]
        a = np.asarray(layer.coeff)[np.asarray(h.rel)]
        fixed.append((jnp.asarray(msg), jnp.asarray(a)))

    def fwd_kernel(c, b, m0, a0, m1, a1):
        for h, (msg, a) in zip(halves, ((m0, a0), (m1, a1))):
            agg = sp._basis_fused_call(msg + c, a, h.dst, h.indptr,
                                       n_ent, n_b, interp,
                                       sp.BASIS_FWD_VARIANT)
            c = c + agg[0, 0]
        return c
    if want("fwd_kernel"):
        results["fwd_kernel"] = timed(scan(
            fwd_kernel, fixed[0][0], fixed[0][1], fixed[1][0], fixed[1][1]))

    def einsum_proj(c, b):
        x = params.entity_embedding + c
        agg = jnp.zeros((n_ent, n_b, d), jnp.float32) + c
        h = (jnp.einsum("nbd,bdo->no", agg, layer.basis,
                        preferred_element_type=jnp.float32) * 2
             + x @ layer.self_weight)
        return c + h[0, 0] * 1e-20
    if want("einsum"):
        results["einsum"] = timed(scan(einsum_proj))

    # backward pieces: padded-order operands per plan
    g_fixed = jnp.ones((n_ent, n_b, d_pad), jnp.float32)

    def bwd_operands(c, b):
        x = params.entity_embedding + c
        for name in ("inb", "outb"):
            (srcp, relp, normp, dstp, maskp, sperm_pad, s_normp,
             chunk_bounds) = plans[name][0]
            msgp = sp._pad_cols(x[srcp] * normp[:, None])
            ap = sp._pad_cols(layer.coeff[relp])
            c = c + msgp[0, 0] + ap[0, 0]
        return c
    if want("bwd_operands"):
        results["bwd_operands"] = timed(scan(bwd_operands))

    fixed_bwd = {}
    for name, h in zip(("inb", "outb"), halves):
        (srcp, relp, normp, dstp, maskp, sperm_pad, s_normp,
         chunk_bounds) = plans[name][0]
        n_tiles, tile_n, tile_e = plans[name][1]
        msgp = np.asarray(params.entity_embedding)[np.asarray(srcp)] \
            * np.asarray(normp)[:, None]
        msgp = np.pad(msgp, ((0, 0), (0, d_pad - d)))
        ap128 = np.pad(np.asarray(layer.coeff)[np.asarray(relp)],
                       ((0, 0), (0, 128 - n_b)))
        gflat = np.ones((n_tiles * tile_n, n_b * d_pad), np.float32)
        fixed_bwd[name] = (jnp.asarray(gflat), jnp.asarray(msgp),
                           jnp.asarray(ap128), dstp, chunk_bounds,
                           (n_tiles, tile_n, tile_e), maskp, relp,
                           sperm_pad, s_normp)

    def bwd_band(c, b, *arrs):
        for i, name in enumerate(("inb", "outb")):
            gflat, msgp, ap = arrs[3 * i: 3 * i + 3]
            (_, _, _, dstp, cb, meta, maskp, relp, sperm_pad,
             s_normp) = fixed_bwd[name]
            n_tiles, tile_n, tile_e = meta
            dmsg, da = sp._basis_bwd_call(gflat + c, msgp, ap, dstp, cb,
                                          n_tiles, tile_n, tile_e, n_b,
                                          interp, sp.BASIS_BWD_VARIANT)
            c = c + dmsg[0, 0] + da[0, 0]
        return c
    if want("bwd_band"):
        results["bwd_band"] = timed(scan(
            bwd_band, *[fixed_bwd[n][i] for n in ("inb", "outb")
                        for i in range(3)]))

    # fixed band outputs for the downstream pieces
    fixed_out = {}
    for name in ("inb", "outb"):
        (gflat, msgp, ap, dstp, cb, meta, maskp, relp, sperm_pad,
         s_normp) = fixed_bwd[name]
        e_pad2 = msgp.shape[0]
        fixed_out[name] = (jnp.ones((e_pad2, d_pad), jnp.float32),
                           jnp.ones((e_pad2, 128), jnp.float32))

    def bwd_readback(c, b, dm0, dm1):
        for name, dmsg_pad in zip(("inb", "outb"), (dm0, dm1)):
            (_, _, _, _, _, _, maskp, relp, sperm_pad, s_normp) = \
                fixed_bwd[name]
            contrib_s = (dmsg_pad + c)[sperm_pad][:, :d] * s_normp[:, None]
            c = c + contrib_s[0, 0]
        return c
    if want("bwd_readback"):
        results["bwd_readback"] = timed(scan(
            bwd_readback, fixed_out["inb"][0], fixed_out["outb"][0]))

        def bwd_readback_narrow(c, b, dm0, dm1):
            for name, dmsg_pad in zip(("inb", "outb"), (dm0, dm1)):
                (_, _, _, _, _, _, maskp, relp, sperm_pad, s_normp) = \
                    fixed_bwd[name]
                contrib_s = (dmsg_pad + c)[:, :d][sperm_pad] \
                    * s_normp[:, None]
                c = c + contrib_s[0, 0]
            return c
        results["bwd_readback_narrow"] = timed(scan(
            bwd_readback_narrow, fixed_out["inb"][0], fixed_out["outb"][0]))

    def bwd_dx(c, b):
        for name, h in zip(("inb", "outb"), halves):
            contrib_s = jnp.ones((h.src.shape[0], d), jnp.float32) + c
            dx = sp.segment_sum_pallas(contrib_s, h.s_src, h.s_indptr,
                                       n_ent, interpret=interp)
            c = c + dx[0, 0]
        return c
    if want("bwd_dx"):
        results["bwd_dx"] = timed(scan(bwd_dx))

    def bwd_dcoeff(c, b, da0, da1):
        for name, da_pad in zip(("inb", "outb"), (da0, da1)):
            (_, _, _, _, _, _, maskp, relp, sperm_pad, s_normp) = \
                fixed_bwd[name]
            dc = sp._segment_sum_few((da_pad + c) * maskp[:, None], relp,
                                     2 * n_rel, rdata=None,
                                     interpret=interp)[:, :n_b]
            c = c + dc[0, 0]
        return c
    if want("bwd_dcoeff"):
        results["bwd_dcoeff"] = timed(scan(
            bwd_dcoeff, fixed_out["inb"][1], fixed_out["outb"][1]))

    if scope == "all":
        # ---- encoder-level + full step (the expensive compiles)
        def enc_f(c, b):
            ae, ar, _ = model.encode(
                params, state, graph, train=True,
                rngs={"layer0": jax.random.fold_in(key, b)})
            return c + jnp.sum(ae[0]) + jnp.sum(ar[0])
        results["enc_f"] = timed(scan(enc_f))

        def enc_fb(c, b):
            def loss_fn(pp):
                ae, ar, _ = model.encode(
                    pp, state, graph, train=True,
                    rngs={"layer0": jax.random.fold_in(key, b)})
                return jnp.sum(ae) + jnp.sum(ar)
            l, g = jax.value_and_grad(loss_fn)(params)
            return c + l * 1e-20 + g.entity_embedding[0, 0]
        results["enc_fb"] = timed(scan(enc_fb))

        queries = tri[:, :2].astype(np.int32)
        bank = make_query_bank(queries, [[int(o)] for o in tri[:, 2]], n_ent)
        trainer = NegativeSamplingTrainer(cfg, model, graph, {"train": bank})
        lr = jnp.float32(cfg.learning_rate)
        idx = jnp.asarray(
            rng.integers(2 * n_edge, size=(STEPS, batch)).astype(np.int32))
        mask = jnp.ones((STEPS, batch), jnp.float32)

        carry = [params, state, opt_state]

        def full():
            # the epoch jit donates its carry — thread it across reps
            p, s, o, loss = trainer._neg_epoch_jit(
                carry[0], carry[1], carry[2], graph, trainer.pos_triples,
                root_key(cfg, 3), lr, idx, mask)
            carry[:] = [p, s, o]
            return float(loss.mean())
        results["full"] = timed(full)

    per_step = {k: round(v / STEPS * 1e3, 3) for k, v in results.items()}
    meta = {n: plans[n][1] for n in plans} if plans else None
    print(json.dumps({
        "scope": scope, "ms_per_step": per_step, "plan_meta": meta,
        "tile_env": {k: os.environ.get(k) for k in
                     ("KGC_BASIS_TILE_N", "KGC_BASIS_TILE_E",
                      "KGC_BASIS_BWD_VARIANT", "KGC_BASIS_FWD_TILE_N",
                      "KGC_BASIS_FWD_VARIANT")},
        "steps_per_s_full": (round(STEPS / results["full"], 1)
                             if "full" in results else None)}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
