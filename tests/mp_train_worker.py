"""Worker process for tests/test_multiprocess.py — NOT a test module.

Runs one sharded training step through the framework's real multi-process
path: ``parallel.distributed.maybe_initialize`` (from the env the launcher
set), ``make_mesh`` over the GLOBAL device set, ``shard_graph/shard_params``
(which route placement through ``put_global`` —
``jax.make_array_from_callback`` under multi-process), and the Trainer's
jitted step.  Prints ``LOSS <value>`` on every process; the test asserts the
processes agree with each other and with a single-process reference.

``build_problem`` is the single source of the problem definition — the test
imports it for the single-process reference so the two sides cannot drift.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def build_problem():
    """(cfg, ds, graph, banks, step_batch) — identical on every caller."""
    import numpy as np

    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_banks
    from kgc_gcn_tpu.data.dataset import build_dataset
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.data.toy import toy_triples

    train, valid, test = toy_triples(n_ent=12, n_rel=4, n_train=40)
    ds = build_dataset("toy", train, valid, test)
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                    pad_to=8)
    banks = make_banks(ds)
    cfg = dataset_preset("Toy", gcn_in_dim=8, gcn_out_dim=32, k_w=4, k_h=8,
                         num_filter=2, kernel_size=3, batch_size=8)
    bank = banks["train"]
    batch = (np.asarray(bank.queries[:8]), np.asarray(bank.label_idx[:8]),
             np.ones((8,), np.float32))
    return cfg, ds, g, banks, batch


def run_step(cfg, ds, g, banks, batch, mesh=None):
    """One jitted train step (sharded when ``mesh`` is given); returns loss."""
    import jax
    import jax.numpy as jnp

    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.parallel.mesh import shard_graph, shard_params
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    if mesh is not None:
        g = shard_graph(g, mesh)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad, mesh=mesh)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    if mesh is not None:
        params = shard_params(params, mesh)
        state = shard_params(state, mesh)
        opt_state = shard_params(opt_state, mesh)
    trainer = Trainer(cfg, model, g, banks, mesh=mesh)
    q, lbl, mask = batch
    *_, loss = trainer._train_step_jit(
        params, state, opt_state, g, jnp.float32(1e-3),
        jnp.asarray(q), jnp.asarray(lbl), jnp.asarray(mask),
        jax.random.PRNGKey(3))
    return float(loss)


def run_epoch_surfaces(cfg, ds, g, banks, mesh, ckpt_dir):
    """The PRODUCTION multi-process surfaces (not just the raw step): one
    full scan-epoch (train_epoch's lax.scan over the sharded batch plan),
    one filtered-rank evaluate, and a checkpoint save + restore + re-eval
    round-trip (sharded-across-processes leaves route to the orbax backend,
    train/checkpoint.py).  Returns (mean epoch loss, mrr, restored mrr)."""
    import jax
    import numpy as np

    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.parallel.mesh import shard_graph, shard_params
    from kgc_gcn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    if mesh is not None:
        g = shard_graph(g, mesh)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad, mesh=mesh)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    if mesh is not None:
        params = shard_params(params, mesh)
        state = shard_params(state, mesh)
        opt_state = shard_params(opt_state, mesh)
    trainer = Trainer(cfg, model, g, banks, mesh=mesh)
    params, state, opt_state, loss = trainer.train_epoch(
        params, state, opt_state, 1, np.random.default_rng(7),
        jax.random.PRNGKey(5))
    mrr = trainer.evaluate(params, state, "valid")["mrr"]
    if ckpt_dir:
        save_checkpoint(ckpt_dir, {"params": params, "state": state}, mrr)
        tree, best = load_checkpoint(
            ckpt_dir, {"params": params, "state": state})
        assert abs(best - mrr) < 1e-6, (best, mrr)   # measure stored as f32
        mrr2 = trainer.evaluate(tree["params"], tree["state"], "valid")["mrr"]
    else:
        mrr2 = mrr
    return float(loss), float(mrr), float(mrr2)


def main() -> None:
    import jax

    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_num_cpu_devices",
                      int(os.environ.get("KGC_MP_LOCAL_DEVICES", "2")))

    from kgc_gcn_tpu.parallel.distributed import maybe_initialize
    from kgc_gcn_tpu.parallel.mesh import make_mesh

    assert maybe_initialize(), "coordination env vars missing"
    cfg, ds, g, banks, batch = build_problem()
    cfg = cfg.replace(data_axis=1, graph_axis=jax.device_count())
    mesh = make_mesh(cfg.data_axis, cfg.graph_axis)
    with mesh:
        loss = run_step(cfg, ds, g, banks, batch, mesh=mesh)
    print(f"LOSS {loss:.8f}", flush=True)

    # production surfaces on a (2 data x 2 graph) mesh spanning the processes
    ckpt_dir = os.environ.get("KGC_MP_CKPT_DIR", "")
    cfg2 = cfg.replace(data_axis=2, graph_axis=jax.device_count() // 2)
    mesh2 = make_mesh(cfg2.data_axis, cfg2.graph_axis)
    with mesh2:
        eloss, mrr, mrr2 = run_epoch_surfaces(
            cfg2, ds, g, banks, mesh2, ckpt_dir)
    print(f"EPOCH {eloss:.8f} {mrr:.8f} {mrr2:.8f}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
