"""Edge-partitioning scaling-efficiency harness (BASELINE.md: >=80% edges/s
going 1 -> N devices).

Measures training edges/s with the graph edge-partitioned over
``graph_axis in {1, 2, 4, ..., N}`` and reports

    scaling_efficiency(N) = rate(N) / (N * rate(1))

for the largest axis — the fraction of perfect strong scaling retained.

Device selection: by default the script forces an 8-virtual-device CPU mesh
(the only multi-device substrate on this machine — see CLAUDE.md); on real
multi-chip TPU hardware run with ``KGC_SCALE_PLATFORM=native`` and the same
code measures over the real devices, no changes needed.  CPU-mesh numbers are
DIRECTIONAL (host collectives != ICI), but they exercise the identical GSPMD
program the TPU pod would run.

Usage: python scripts/scaling_bench.py            # one JSON line on stdout
Env:   KGC_SCALE_DEVICES (default 8), KGC_SCALE_PLATFORM=native|cpu,
       KGC_SCALE_STEPS (default 8), KGC_SCALE_EDGES (default 120000),
       KGC_SCALE_SCHEDULE=none|gather|ring|boundary (default none — plain
       edge partition; the entity-sharded schedules also shard the (N, d)
       activations, so their efficiency is the pod number that matters for
       beyond-HBM graphs).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(os.environ.get("KGC_SCALE_DEVICES", "8"))

import jax  # noqa: E402

if os.environ.get("KGC_SCALE_PLATFORM", "cpu") != "native":
    # must run before first backend use (jax is pre-imported in this
    # environment, but the backend is not yet initialized — conftest.py
    # does the same)
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_num_cpu_devices", N_DEV)

import numpy as np  # noqa: E402


def measure(graph_axis: int, graph, cfg, tri, n_ent, n_edge, steps, batch):
    import jax.numpy as jnp
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph, shard_params
    from kgc_gcn_tpu.train.loop import Trainer, root_key
    from kgc_gcn_tpu.train.optim import make_optimizer

    schedule = os.environ.get("KGC_SCALE_SCHEDULE", "none")
    if graph_axis > 1 and schedule != "none":
        cfg = cfg.replace(entity_sharded=schedule, graph_axis=graph_axis)
    mesh = None
    if graph_axis > 1:
        mesh = make_mesh(data=1, graph=graph_axis)
    model = build_model(cfg, n_ent, graph.n_rel, n_edge, e_pad=graph.e_pad,
                        mesh=mesh)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    bank = make_query_bank(tri[:, :2].astype(np.int32),
                           [[int(o)] for o in tri[:, 2]], n_ent)

    if mesh is not None:
        graph = shard_graph(graph, mesh)
        params = shard_params(params, mesh)
        state = shard_params(state, mesh)
        opt_state = shard_params(opt_state, mesh)
    trainer = Trainer(cfg, model, graph, {"train": bank}, mesh=mesh)
    lr = jnp.float32(cfg.learning_rate)
    rng = np.random.default_rng(0)

    def run(p, s, o, seed):
        idx = rng.integers(bank.n_queries, size=(steps, batch)).astype(np.int32)
        mask = np.ones((steps, batch), np.float32)
        p, s, o, loss = trainer._train_epoch_jit(
            p, s, o, graph, root_key(cfg, seed), lr,
            jnp.asarray(idx), jnp.asarray(mask), bank.queries, bank.label_idx)
        return p, s, o, float(loss.mean())   # host pull = device sync

    p, s, o, _ = run(params, state, opt_state, 1)   # compile + warmup
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        p, s, o, _ = run(p, s, o, 10 + rep)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    return steps * (2 * n_edge + n_ent) / dt


def main():
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.graph import build_graph

    n_dev = len(jax.devices())
    steps = int(os.environ.get("KGC_SCALE_STEPS", "8"))
    n_edge = int(os.environ.get("KGC_SCALE_EDGES", "120000"))
    n_ent, n_rel, batch = 8192, 11, 64

    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)
    # small model dims keep the replicated (non-partitioned) work minor, so
    # the measurement isolates the edge-partitioned aggregation that the
    # graph axis is meant to scale
    # use_pallas pinned OFF: on the virtual-CPU substrate the per-shard
    # kernels run in interpret mode, whose overhead would distort the
    # scaling ratio this harness isolates (the WN18RR preset defaults the
    # kernels ON since round 3)
    cfg = dataset_preset("WN18RR", batch_size=batch, gcn_in_dim=64,
                         gcn_out_dim=128, k_w=8, k_h=16, num_filter=16,
                         use_pallas=False)

    axes = [a for a in (1, 2, 4, 8, 16, 32) if a <= n_dev
            and graph.e_pad % a == 0]
    rates = {}
    for a in axes:
        rates[a] = measure(a, graph, cfg, tri, n_ent, n_edge, steps, batch)
        print(f"# graph_axis={a}: {rates[a] / 1e6:.2f} Medges/s total, "
              f"{rates[a] / a / 1e6:.2f} per device", file=sys.stderr)

    top = max(axes)
    eff = rates[top] / (top * rates[1])
    # substrate honesty: N VIRTUAL devices time-sharing few physical cores
    # cannot exhibit strong scaling (total compute per step is constant and
    # replicated work serializes N-fold) — there `rate(N)/rate(1)` is the
    # meaningful proxy: 1.0 = sharding adds zero overhead on a serialized
    # substrate; the `value` formula itself is the real-pod one.
    virtual = (jax.devices()[0].platform == "cpu"
               and n_dev > (os.cpu_count() or 1))
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"fraction of perfect 1->{top} strong scaling",
        "vs_baseline": round(eff / 0.8, 3),   # BASELINE.md target: >=0.8
        "detail": {
            "schedule": os.environ.get("KGC_SCALE_SCHEDULE", "none"),
            "platform": jax.devices()[0].platform,
            "devices": n_dev, "axes": axes,
            "virtual_devices": virtual,
            "serialized_substrate_overhead": round(rates[1] / rates[top], 3)
            if virtual else None,   # t_N / t_1: >1 = GSPMD/collective overhead
            "note": ("N virtual devices share "
                     f"{os.cpu_count()} cores: strong scaling is "
                     "unmeasurable here; run on real multi-chip hardware "
                     "(KGC_SCALE_PLATFORM=native) for a calibrated value")
            if virtual else None,
            "medges_per_s": {str(a): round(r / 1e6, 3)
                             for a, r in rates.items()},
            "steps": steps,
            "graph": {"n_ent": n_ent, "n_rel": n_rel, "n_edge": n_edge},
        },
    }))


if __name__ == "__main__":
    main()
