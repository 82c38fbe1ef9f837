"""A/B the one-vs-all loss implementations on the real TPU, back-to-back.

WN18RR-scale synthetic graph, pallas SpMM, 50-step scans, host-synced by
pulling the loss scalar (BENCH_NOTES.md measurement rules).  Usage:

    python scripts/ab_loss.py [dense sparse fused] [--moment bfloat16]
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(loss_impl: str, moment_dtype: str = "float32", reps: int = 3):
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    n_ent, n_rel, n_edge, batch, steps = 40943, 11, 86835, 128, 50
    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)

    cfg = dataset_preset("WN18RR", batch_size=batch, use_pallas=True,
                         loss_impl=loss_impl, moment_dtype=moment_dtype)
    model = build_model(cfg, n_ent, n_rel, n_edge, e_pad=graph.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    queries = tri[:, :2].astype(np.int32)
    labels = [[int(o)] for o in tri[:, 2]]
    bank = make_query_bank(queries, labels, n_ent)
    trainer = Trainer(cfg, model, graph, {"train": bank})
    lr = jnp.float32(cfg.learning_rate)

    def go(p, s, o, seed):
        idx = rng.integers(n_edge, size=(steps, batch)).astype(np.int32)
        mask = np.ones((steps, batch), np.float32)
        p, s, o, loss = trainer._train_epoch_jit(
            p, s, o, graph, jax.random.PRNGKey(seed), lr,
            jnp.asarray(idx), jnp.asarray(mask), bank.queries, bank.label_idx)
        return p, s, o, float(loss.mean())

    p, s, o, _ = go(params, state, opt_state, 1)  # compile + warmup
    times, loss = [], 0.0
    for rep in range(reps):
        t0 = time.perf_counter()
        p, s, o, loss = go(p, s, o, 10 + rep)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    sps = steps / dt
    print(f"{loss_impl:>6s} moment={moment_dtype:8s}: {sps:6.1f} steps/s  "
          f"({dt:.3f}s median, loss={loss:.5f}, "
          f"{sps * (2 * n_edge + n_ent) / 1e6:.1f} Medges/s)", flush=True)


if __name__ == "__main__":
    impls = [a for a in sys.argv[1:] if not a.startswith("--")] or \
        ["dense", "sparse", "fused"]
    moment = "bfloat16" if "--moment" in " ".join(sys.argv) else "float32"
    for impl in impls:
        run(impl, moment)
