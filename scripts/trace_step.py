"""Capture a device trace of the full training step and print the op breakdown.

Runs a few scanned training steps under ``jax.profiler.trace``, then parses the
TensorBoard ``trace.json.gz`` and aggregates device-op durations by name so the
hot ops are visible without TensorBoard (not installed here).

Usage: python scripts/trace_step.py [pallas|fb15k|stacked_xla|fb15k_sx|...]

Any mode may carry a ``_bf16`` suffix (e.g. ``fb15k_sx_bf16``) to trace the
same schedule with ``compute_dtype=bfloat16`` — used to localize the
stacked_xla bf16 FB15k regression (BENCH_NOTES round 2).
"""

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 20


def main(mode="pallas"):
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.utils.compile_cache import enable_compile_cache_from_env
    enable_compile_cache_from_env()   # KGC_COMPILE_CACHE_DIR: skip recompiles
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer, root_key
    from kgc_gcn_tpu.train.optim import make_optimizer

    bf16 = mode.endswith("_bf16")
    if bf16:
        mode = mode[:-5]
    if mode.startswith(("fb15k", "rgcn")):
        n_ent, n_rel, n_edge, batch = 14541, 237, 272115, 128
    else:
        n_ent, n_rel, n_edge, batch = 40943, 11, 86835, 128
    rng = np.random.default_rng(0)
    tri = np.stack([
        rng.integers(n_ent, size=n_edge),
        rng.integers(n_rel, size=n_edge),
        rng.integers(n_ent, size=n_edge),
    ], axis=1).astype(np.int64)
    graph = build_graph(tri, n_ent, n_rel)

    # pin the dtypes AND the module kernel knobs: trace-mode names must mean
    # the same config regardless of preset/default evolution (FB15k-237
    # defaults to bf16 since round 3; env still overrides for A/Bs)
    import kgc_gcn_tpu.models.rgat as _rgat_mod
    import kgc_gcn_tpu.ops.spmm_pallas as _sp
    _rgat_mod.RGAT_LAYOUT = os.environ.get("KGC_RGAT_LAYOUT", "flat")
    _sp.BASIS_BWD_VARIANT = os.environ.get(
        "KGC_BASIS_BWD_VARIANT", "da_matmul")
    _sp.BASIS_TILE_N = int(os.environ.get("KGC_BASIS_TILE_N", 128))
    _sp.BASIS_PAD = os.environ.get("KGC_BASIS_PAD", "through")
    cfg = dataset_preset("FB15k-237"
                         if mode.startswith(("fb15k", "rgcn")) else "WN18RR",
                         batch_size=batch, use_pallas=False,
                         compute_dtype="float32", moment_dtype="float32")
    if mode in ("pallas", "fb15k"):
        cfg = cfg.replace(use_pallas=True)
    elif mode in ("stacked_xla", "fb15k_sx"):
        cfg = cfg.replace(use_pallas=True, spmm_mode="stacked_xla")
    elif mode == "rgat":
        cfg = cfg.replace(model="rgat", decoder="distmult", num_heads=4)
    elif mode == "rgat_pallas":
        # matches bench.py rgat_pallas (the round-3 34.9 steps/s config)
        cfg = cfg.replace(model="rgat", decoder="distmult", num_heads=4,
                          use_pallas=True)
    elif mode in ("rgcn", "rgcn_pallas"):
        # matches bench.py rgcn / rgcn_pallas (BASELINE.json config 3)
        cfg = cfg.replace(model="rgcn", decoder="distmult", num_bases=30,
                          train_mode="negative_sampling", num_negatives=64,
                          use_pallas=(mode == "rgcn_pallas"))
    elif mode == "eval":
        cfg = cfg.replace(use_pallas=True)   # matches bench.py eval mode
    if bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    model = build_model(cfg, n_ent, n_rel, n_edge, e_pad=graph.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    queries = tri[:, :2].astype(np.int32)
    labels = [[int(o)] for o in tri[:, 2]]
    bank = make_query_bank(queries, labels, n_ent)
    if cfg.train_mode == "negative_sampling":
        from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
        trainer = NegativeSamplingTrainer(cfg, model, graph, {"train": bank})
    else:
        trainer = Trainer(cfg, model, graph, {"train": bank})
    lr = jnp.float32(cfg.learning_rate)

    idx = jnp.asarray(rng.integers(n_edge, size=(STEPS, batch)).astype(np.int32))
    mask = jnp.ones((STEPS, batch), jnp.float32)

    if mode == "eval":
        # filtered-rank EVALUATION pass (encode once + scanned decode+rank)
        from kgc_gcn_tpu.data.batching import epoch_batches
        eq = np.concatenate([queries, tri[:, 2:3].astype(np.int32)], axis=1)
        ebank = make_query_bank(eq, labels, n_ent)
        n_q = STEPS * batch
        eidx, emask = epoch_batches(n_q, batch, np.random.default_rng(0),
                                    shuffle=False)
        eidx, emask = jnp.asarray(eidx), jnp.asarray(emask)

        def run(p, s, o, seed):
            sums = trainer._eval_pass_jit(
                p, s, graph, eidx, emask, ebank.queries[:n_q],
                ebank.label_idx[:n_q])
            return p, s, o, float(sums["count"])
    elif cfg.train_mode == "negative_sampling":
        nidx = jnp.asarray(rng.integers(
            2 * n_edge, size=(STEPS, batch)).astype(np.int32))

        def run(p, s, o, seed):
            p, s, o, loss = trainer._neg_epoch_jit(
                p, s, o, graph, trainer.pos_triples, root_key(cfg, seed), lr,
                nidx, mask)
            return p, s, o, float(loss.mean())
    else:
        def run(p, s, o, seed):
            p, s, o, loss = trainer._train_epoch_jit(
                p, s, o, graph, root_key(cfg, seed), lr, idx, mask,
                bank.queries, bank.label_idx)
            return p, s, o, float(loss.mean())

    p, s, o, _ = run(params, state, opt_state, 1)   # compile + warmup

    logdir = "/tmp/jax_trace"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    p, s, o, _ = run(p, s, o, 2)
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz"))
    if not traces:
        print("NO TRACE FILES — profiler unsupported through tunnel?")
        print(os.popen(f"find {logdir} -type f").read())
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # aggregate device ops by SOURCE LINE (jax metadata), then by op name
    import collections
    agg = collections.Counter()
    cnt = collections.Counter()
    sample = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev or not ev.get("args"):
            continue
        a = ev["args"]
        if "device_duration_ps" not in a:
            continue
        name = ev["name"]
        if name.startswith(("while", "jit_", "2", "copy-start")):
            continue   # enclosing-region events double-count their children
        key = f'{a.get("source", "?")}  [{a.get("tf_op", "?").split("/")[-1]}]'
        agg[key] += ev["dur"]
        cnt[key] += 1
        sample[key] = name
    total = sum(agg.values())
    print(f"# total attributed device-op time: {total/1e3:.2f} ms "
          f"over {STEPS} steps = {total/STEPS/1e3:.3f} ms/step")
    for k, us in agg.most_common(40):
        print(f"{us/STEPS/1e3:7.3f} ms/step x{cnt[k]//STEPS:<4d} {k[:120]}  "
              f"{sample[k][:30]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pallas")
