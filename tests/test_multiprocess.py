"""REAL multi-process distributed execution (2 processes x 2 CPU devices,
Gloo over localhost): the framework's multi-host path — coordination-service
init from env vars, global mesh, process-local shard placement via
put_global/make_array_from_callback — is executed, not just unit-mocked.
The sharded step's loss must agree across processes AND with a
single-process reference."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step_matches_single_process(toy, toy_cfg):
    # subprocess timeouts bound the test (communicate(timeout=240) below)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_train_worker.py")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORM_NAME="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            KGC_MP_LOCAL_DEVICES="2",
        )
        env.pop("PYTHONPATH", None)   # breaks the axon plugin (CLAUDE.md)
        env.pop("JAX_PLATFORMS", None)   # parent may pin the axon backend,
        #   which the CPU-only worker cannot initialize
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert line, out
        losses.append(float(line[-1].split()[1]))
    assert losses[0] == losses[1]   # identical global computation

    # single-process reference on the same problem (the toy fixture differs,
    # so rebuild exactly what the worker builds)
    import jax
    import jax.numpy as jnp
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.data.batching import make_banks
    from kgc_gcn_tpu.data.dataset import build_dataset
    from kgc_gcn_tpu.data.graph import build_graph
    from kgc_gcn_tpu.data.toy import toy_triples
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.train.loop import Trainer
    from kgc_gcn_tpu.train.optim import make_optimizer

    train, valid, test = toy_triples(n_ent=12, n_rel=4, n_train=40)
    ds = build_dataset("toy", train, valid, test)
    g = build_graph(ds.train_triples, ds.num_entity, ds.num_relation,
                    pad_to=8)
    banks = make_banks(ds)
    cfg = dataset_preset("Toy", gcn_in_dim=8, gcn_out_dim=32, k_w=4, k_h=8,
                         num_filter=2, kernel_size=3, batch_size=8)
    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=g.e_pad)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = make_optimizer(cfg).init(params)
    trainer = Trainer(cfg, model, g, banks)
    bank = banks["train"]
    *_, ref = trainer._train_step_jit(
        params, state, opt_state, g, jnp.float32(1e-3),
        jnp.asarray(np.asarray(bank.queries[:8])),
        jnp.asarray(np.asarray(bank.label_idx[:8])),
        jnp.ones((8,), jnp.float32), jax.random.PRNGKey(3))
    np.testing.assert_allclose(losses[0], float(ref), rtol=1e-5, atol=1e-6)
