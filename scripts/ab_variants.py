"""A/B config variants of the pallas training step on the real TPU,
back-to-back in one process (BENCH_NOTES.md measurement rules).

Usage: python scripts/ab_variants.py name=key:val,key:val [name2=...]
e.g.:  python scripts/ab_variants.py control=rel_compose:gather \
           onehot= onehot_bf16m=moment_dtype:bfloat16
(empty spec = current defaults; all variants share use_pallas=True +
loss_impl=sparse unless overridden)
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maybe_cache():
    from kgc_gcn_tpu.utils.compile_cache import enable_compile_cache_from_env
    enable_compile_cache_from_env()   # KGC_COMPILE_CACHE_DIR: skip recompiles


def build(overrides):
    _maybe_cache()
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_query_bank
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    if os.environ.get("AB_GRAPH") == "fb15k":
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
    kw = dict(batch_size=batch, use_pallas=True, loss_impl="sparse",
              compute_dtype="float32", moment_dtype="float32")
    # every baseline-relevant field is pinned so preset evolution (e.g. the
    # round-3 kernels-on-by-default presets) cannot silently change what a
    # bare variant measures
    kw.update(overrides)
    # CLI override values arrive as strings — coerce to the Config field's
    # declared type (a str-typed batch_size would break tracing mid-session)
    import dataclasses
    from kgc_gcn_tpu.config import Config
    field_types = {f.name: f.type for f in dataclasses.fields(Config)}
    for k, v in list(kw.items()):
        if not isinstance(v, str) or k not in field_types:
            continue
        t = field_types[k]
        if t == "bool" or t is bool:
            kw[k] = v.lower() in ("1", "true", "yes")
        elif t == "int" or t is int:
            kw[k] = int(v)
        elif t == "float" or t is float:
            kw[k] = float(v)
    # module knob, not a Config field — RESET it for every variant (a value
    # set by one variant must not leak into the next; see BENCH_NOTES)
    import kgc_gcn_tpu.ops.spmm_pallas as sp
    sp.ONEHOT_LIMIT = int(kw.pop(
        "onehot_limit", os.environ.get("KGC_ONEHOT_LIMIT", 256 * 1024 * 1024)))
    sp.BF16_CAST = kw.pop(
        "bf16_cast", os.environ.get("KGC_BF16_CAST", "pre"))
    sp.ATTN_MAX = kw.pop(
        "attn_max", os.environ.get("KGC_ATTN_MAX", "pallas"))
    sp.SPERM_BARRIER = str(kw.pop(
        "sperm_barrier",
        os.environ.get("KGC_SPERM_BARRIER", "0"))) == "1"
    sp.BASIS_TILE_N = int(kw.pop(
        "basis_tile_n", os.environ.get("KGC_BASIS_TILE_N", 128)))
    sp.BASIS_TILE_E = int(kw.pop(
        "basis_tile_e", os.environ.get("KGC_BASIS_TILE_E", 256)))
    import kgc_gcn_tpu.models.rgat as rgat_mod
    rgat_mod.RGAT_LAYOUT = kw.pop(
        "rgat_layout", os.environ.get("KGC_RGAT_LAYOUT", "flat"))
    sp.BASIS_BWD_VARIANT = kw.pop(
        "basis_bwd_variant", os.environ.get("KGC_BASIS_BWD_VARIANT", "da_matmul"))
    sp.BASIS_READBACK = kw.pop(
        "basis_readback", os.environ.get("KGC_BASIS_READBACK", "wide"))
    sp.BASIS_PAD = kw.pop(
        "basis_pad", os.environ.get("KGC_BASIS_PAD", "through"))
    sp.EDGE_CONTRIB = kw.pop(
        "edge_contrib", os.environ.get("KGC_EDGE_CONTRIB", "f32"))
    sp.MGCN_CONTRIB = kw.pop(
        "mgcn_contrib", os.environ.get("KGC_MGCN_CONTRIB", "f32"))
    sp.BASIS_FWD_TILE_N = int(kw.pop(
        "basis_fwd_tile_n", os.environ.get("KGC_BASIS_FWD_TILE_N", 0)))
    sp.BASIS_FWD_VARIANT = kw.pop(
        "basis_fwd_variant", os.environ.get("KGC_BASIS_FWD_VARIANT", "loop"))
    cfg = dataset_preset("WN18RR", **kw)
    model = build_model(cfg, n_ent, n_rel, n_edge, e_pad=graph.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    queries = tri[:, :2].astype(np.int32)
    bank = make_query_bank(queries, [[int(o)] for o in tri[:, 2]], n_ent)
    if cfg.train_mode == "negative_sampling":
        from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
        trainer = NegativeSamplingTrainer(cfg, model, graph, {"train": bank})
    else:
        trainer = Trainer(cfg, model, graph, {"train": bank})
    return (trainer, graph, bank, params, state, opt_state,
            jnp.float32(cfg.learning_rate), rng, n_edge, batch)


def run(name, overrides, steps=50, reps=3):
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.train.loop import root_key
    (trainer, graph, bank, p, s, o, lr, rng, n_edge, batch) = build(overrides)

    if trainer.cfg.train_mode == "negative_sampling":
        def go(p, s, o, seed):
            idx = rng.integers(2 * n_edge, size=(steps, batch)).astype(
                np.int32)
            mask = np.ones((steps, batch), np.float32)
            p, s, o, loss = trainer._neg_epoch_jit(
                p, s, o, graph, trainer.pos_triples,
                root_key(trainer.cfg, seed), lr,
                jnp.asarray(idx), jnp.asarray(mask))
            return p, s, o, float(loss.mean())
    else:
        def go(p, s, o, seed):
            idx = rng.integers(n_edge, size=(steps, batch)).astype(np.int32)
            mask = np.ones((steps, batch), np.float32)
            p, s, o, loss = trainer._train_epoch_jit(
                p, s, o, graph, root_key(trainer.cfg, seed), lr,
                jnp.asarray(idx), jnp.asarray(mask), bank.queries,
                bank.label_idx)
            return p, s, o, float(loss.mean())

    p, s, o, _ = go(p, s, o, 1)
    times, loss = [], 0.0
    for rep in range(reps):
        t0 = time.perf_counter()
        p, s, o, loss = go(p, s, o, 10 + rep)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    print(f"{name:>16s} {overrides}: {steps/dt:6.1f} steps/s "
          f"({dt:.3f}s median, loss={loss:.5f})", flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        name, _, kvs = spec.partition("=")
        overrides = {}
        if kvs:
            for kv in kvs.split(","):
                k, _, v = kv.partition(":")
                overrides[k] = v
        run(name, overrides)
