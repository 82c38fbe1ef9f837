"""Measure the --remat memory crossover with XLA's compile-time analysis.

For a ladder of WN18RR-proportioned graph scales, compiles the full train
step (pallas path, reference dims, batch 128) with remat off and on and
prints each program's HBM footprint from ``compiled.memory_analysis()`` —
no execution, so one remote compile per (scale, remat) is the whole cost
(set KGC_COMPILE_CACHE_DIR to make reruns free).

peak ~= argument bytes (params + Adam state + graph, resident) + temp bytes
(activations/workspace). --remat trades the temp side for recompute
(-22% step time, BENCH_NOTES round 2); the decision rule derived from this
ladder lives in the --remat CLI help and BENCH_NOTES round 3.

Usage: python scripts/remat_probe.py [scale ...]   (default 1 4 16)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(scale: int):
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    n_ent, n_rel = 40943 * scale, 11
    n_edge = 86835 * scale
    batch = 128
    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)

    out = {}
    layers = int(os.environ.get("KGC_PROBE_LAYERS", "1"))
    moment = os.environ.get("KGC_PROBE_MOMENT", "float32")
    for remat in (False, True):
        cfg = dataset_preset("WN18RR", batch_size=batch, use_pallas=True,
                             remat=remat, compute_dtype="float32",
                             moment_dtype=moment, num_layers=layers)
        model = build_model(cfg, n_ent, n_rel, n_edge, e_pad=graph.e_pad)
        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = make_optimizer(cfg).init(params)
        bank = make_query_bank(tri[:batch, :2].astype(np.int32),
                               [[int(o)] for o in tri[:batch, 2]], n_ent)
        trainer = Trainer(cfg, model, graph, {"train": bank})
        lowered = trainer._train_step_jit.lower(
            params, state, opt_state, graph, jnp.float32(1e-3),
            jnp.asarray(bank.queries[:batch]),
            jnp.asarray(bank.label_idx[:batch]),
            jnp.ones((batch,), jnp.float32), jax.random.PRNGKey(0))
        try:
            ma = lowered.compile().memory_analysis()
        except Exception as e:   # typically RESOURCE_EXHAUSTED at compile
            out["remat" if remat else "plain"] = {
                "error": str(e).splitlines()[0][:200]}
            continue
        out["remat" if remat else "plain"] = {
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "alias_mb": round(ma.alias_size_in_bytes / 2**20, 1),
        }
        # donated inputs alias outputs, so peak ~= argument + temp
        out["remat" if remat else "plain"]["peak_mb"] = round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / 2**20, 1)
    print(json.dumps({"scale": scale, "layers": layers, "moments": moment,
                      "n_ent": n_ent, "n_edge": n_edge, **out}))


def main(scales):
    from kgc_gcn_tpu.utils.compile_cache import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    for s in scales:
        probe(s)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 4, 16])
