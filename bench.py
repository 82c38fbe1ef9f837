"""Training-throughput benchmark — prints ONE JSON line.

Metric: edges/s per chip during TRAINING (full forward + backward + Adam
update) on a WN18RR-scale synthetic graph (N=40943, R=11, E=86835 — the real
dataset's shape; the text corpus itself is not distributable) with the
reference hyperparameters (batch 128, d_in 100, d_out 200, ConvE 200x7x7).

"Edges" counts messages aggregated per forward pass: 2E directed edges + N
self-loops (the reference pushes exactly these through propagate per batch,
model.py:99-101), times training steps completed.

vs_baseline compares against the unfused v0 path measured on this same chip
(unsorted segment-sum, per-edge projection in the message loop — the faithful
translation of the reference's torch-scatter schedule): 9.1e8 edges/s on
TPU v5e.  The reference repo itself never measured throughput (SURVEY.md §6).
"""

import json
import time

import numpy as np

# v0 (naive schedule) edges/s on TPU v5 lite, measured 2026-08-17; see bench
# history in BENCH_NOTES.md
BASELINE_EDGES_PER_S = 9.1e8


def main(mode: str = "fused"):
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    n_ent, n_rel, n_edge, batch = 40943, 11, 86835, 128
    steps = 50

    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)

    cfg = dataset_preset("WN18RR", batch_size=batch)
    if mode == "reference":
        cfg = cfg.replace(agg_schedule="reference")
    elif mode == "pallas":
        cfg = cfg.replace(use_pallas=True)
    model = build_model(cfg, n_ent, n_rel, n_edge)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    queries = tri[:, :2].astype(np.int32)
    labels = [[int(o)] for o in tri[:, 2]]
    bank = make_query_bank(queries, labels, n_ent)
    trainer = Trainer(cfg, model, graph, {"train": bank})

    idx, mask = np.zeros((steps, batch), np.int32), np.ones((steps, batch), np.float32)
    idx[:] = rng.integers(n_edge, size=(steps, batch))
    idx_j, mask_j = jnp.asarray(idx), jnp.asarray(mask)
    lr = jnp.float32(cfg.learning_rate)

    def run(p, s, o, key):
        return trainer._train_epoch_jit(
            p, s, o, graph, key, lr, idx_j, mask_j, bank.queries, bank.label_idx)

    # warmup / compile
    p, s, o, _ = run(params, state, opt_state, jax.random.PRNGKey(1))
    jax.block_until_ready(p)

    t0 = time.perf_counter()
    p, s, o, loss = run(p, s, o, jax.random.PRNGKey(2))
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0

    edges_per_step = 2 * n_edge + n_ent
    edges_per_s = steps * edges_per_step / dt
    print(json.dumps({
        "metric": "train_edges_per_s_per_chip"
                  + ("" if mode == "fused" else f"_{mode}"),
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
        "detail": {
            "steps": steps, "sec": round(dt, 4),
            "steps_per_s": round(steps / dt, 2),
            "loss": round(float(loss), 5),
            "graph": {"n_ent": n_ent, "n_rel": n_rel, "n_edge": n_edge},
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "fused")
