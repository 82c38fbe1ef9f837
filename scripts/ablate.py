"""Ablation profiling of the training step on the real TPU.

Times each component of the WN18RR-scale training step in isolation, each as
one jitted ``lax.scan`` of ``STEPS`` iterations (per BENCH_NOTES.md rules:
scan-amortize, sync by pulling a scalar to the host).  The components are
chosen so their times roughly ADD to the full step:

  full         fwd + bwd + clip + Adam (the bench.py measurement)
  fwd          forward + loss only
  enc_fb       encoder fwd+bwd (loss = sum(all_ent) + sum(all_rel))
  enc_f        encoder fwd only
  dec_fb       decoder fwd+bwd on fixed (all_ent, all_rel), incl. label
               build + fused BCE
  labels_bce   label scatter + BCE fwd+bwd on a fixed logits matrix
  adam         optimizer pipeline (clip + Adam + apply) on a fixed grad tree

Usage: python scripts/ablate.py [pallas|fused]   (default pallas)
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
    """Median wall time of REPS synced calls (fn must return a scalar)."""
    fn(*args)  # compile + warmup
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))  # host pull = true sync through the axon tunnel
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main(mode="pallas"):
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import build_labels, make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.ops.losses import bce_with_logits
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import apply_updates_with_lr, make_optimizer

    n_ent, n_rel, n_edge, batch = 40943, 11, 86835, 128
    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)

    # pin the path per mode (the WN18RR preset defaults the kernels ON)
    cfg = dataset_preset("WN18RR", batch_size=batch,
                         use_pallas=(mode == "pallas"))
    model = build_model(cfg, n_ent, n_rel, n_edge, e_pad=graph.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    queries = tri[:, :2].astype(np.int32)
    labels = [[int(o)] for o in tri[:, 2]]
    bank = make_query_bank(queries, labels, n_ent)
    trainer = Trainer(cfg, model, graph, {"train": bank})
    lr = jnp.float32(cfg.learning_rate)

    idx = jnp.asarray(rng.integers(n_edge, size=(STEPS, batch)).astype(np.int32))
    mask = jnp.ones((STEPS, batch), jnp.float32)
    key = jax.random.PRNGKey(1)
    results = {}

    # ---- full step (matches bench.py)
    @jax.jit
    def full(p, s, o):
        p, s, o, losses = trainer._train_epoch(
            p, s, o, graph, key, lr, idx, mask, bank.queries, bank.label_idx)
        return losses.mean()   # _train_epoch returns per-step losses
    results["full"] = timed(full, params, state, opt_state)

    # ---- forward only
    @jax.jit
    def fwd(p, s):
        def body(c, b):
            q = bank.queries[idx[b]]
            lbl = build_labels(bank.label_idx[idx[b]], n_ent, cfg.lbl_smooth)
            logits, _ = model.apply(p, s, graph, q[:, 0], q[:, 1],
                                    train=True, rng=jax.random.fold_in(key, b))
            return c + bce_with_logits(logits, lbl, mask[b]), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return out
    results["fwd"] = timed(fwd, params, state)

    # ---- encoder fwd+bwd
    @jax.jit
    def enc_fb(p, s):
        def body(c, b):
            def loss_fn(pp):
                ae, ar, _ = model.encode(
                    pp, s, graph, train=True,
                    rngs={"conv_in": jax.random.fold_in(key, 2 * b),
                          "conv_out": jax.random.fold_in(key, 2 * b + 1),
                          "gcn": jax.random.fold_in(key, 3 * b + 7)})
                return jnp.sum(ae) + jnp.sum(ar)
            l, g = jax.value_and_grad(loss_fn)(p)
            return c + l + jnp.sum(g.entity_embedding[0]), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return out
    results["enc_fb"] = timed(enc_fb, params, state)

    # ---- encoder fwd only
    @jax.jit
    def enc_f(p, s):
        def body(c, b):
            ae, ar, _ = model.encode(
                p, s, graph, train=True,
                rngs={"conv_in": jax.random.fold_in(key, 2 * b),
                      "conv_out": jax.random.fold_in(key, 2 * b + 1),
                      "gcn": jax.random.fold_in(key, 3 * b + 7)})
            return c + jnp.sum(ae) + jnp.sum(ar), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return out
    results["enc_f"] = timed(enc_f, params, state)

    # ---- decoder fwd+bwd on fixed encoder output
    all_ent, all_rel, _ = jax.jit(
        lambda p, s: model.encode(p, s, graph, train=False))(params, state)

    @jax.jit
    def dec_fb(p, s, ae, ar):
        def body(c, b):
            q = bank.queries[idx[b]]
            lbl = build_labels(bank.label_idx[idx[b]], n_ent, cfg.lbl_smooth)
            def loss_fn(pp, aee):
                logits, _ = model.decode(
                    pp, s, aee, ar, q[:, 0], q[:, 1], train=True,
                    rngs={"feat": jax.random.fold_in(key, 5 * b),
                          "hidden": jax.random.fold_in(key, 5 * b + 1)})
                return bce_with_logits(logits, lbl, mask[b])
            l, (g, ga) = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, ae)
            return c + l + jnp.sum(ga[0]), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return out
    results["dec_fb"] = timed(dec_fb, params, state, all_ent, all_rel)

    # ---- label build + BCE fwd+bwd on a fixed logits matrix
    fixed_logits = jnp.zeros((batch, n_ent), jnp.float32)

    @jax.jit
    def labels_bce(lg):
        def body(c, b):
            lbl = build_labels(bank.label_idx[idx[b]], n_ent, cfg.lbl_smooth)
            l, g = jax.value_and_grad(
                lambda x: bce_with_logits(x, lbl, mask[b]))(lg)
            return c + l + g[0, 0], None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return out
    results["labels_bce"] = timed(labels_bce, fixed_logits)

    # ---- Adam update + apply on a fixed grad tree
    fixed_grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def adam(p, o):
        def body(carry, _):
            p, o = carry
            updates, o = tx.update(fixed_grads, o, p)
            p = apply_updates_with_lr(p, updates, lr)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (p, o), None, length=STEPS)
        return jnp.sum(p.entity_embedding[0])
    results["adam"] = timed(adam, params, opt_state)

    per_step = {k: round(v / STEPS * 1e3, 3) for k, v in results.items()}
    print(json.dumps({"mode": mode, "ms_per_step": per_step,
                      "steps_per_s_full": round(STEPS / results["full"], 1)}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pallas")
