"""REAL multi-process distributed execution (2 processes x 2 CPU devices,
Gloo over localhost): the framework's multi-host path — coordination-service
init from env vars, global mesh, process-local shard placement via
put_global/make_array_from_callback — is executed, not just unit-mocked.
The sharded step's loss must agree across processes AND with a
single-process reference built from the SAME problem definition
(tests/mp_train_worker.py:build_problem)."""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_production_surfaces_match_single_process(tmp_path):
    """One jitted step AND the production surfaces — a full scan epoch, a
    filtered-rank evaluate, a checkpoint save/restore/re-eval (orbax routes
    the cross-process shards) — across 2 real processes, all agreeing with
    each other and with a single-process reference."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_train_worker.py")
    port = _free_port()
    ckpt_dir = str(tmp_path / "mp_ckpt")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORM_NAME="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            KGC_MP_LOCAL_DEVICES="2",
            KGC_MP_CKPT_DIR=ckpt_dir,
        )
        env.pop("PYTHONPATH", None)   # breaks the axon plugin (CLAUDE.md)
        env.pop("JAX_PLATFORMS", None)   # parent may pin the axon backend,
        #   which the CPU-only worker cannot initialize
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs, errs = [], []
    try:
        for p in procs:
            out, err = p.communicate(timeout=480)
            outs.append(out)
            errs.append(err)
    finally:
        for p in procs:   # a hung/failed worker must not outlive the test
            if p.poll() is None:
                p.kill()
    for p, err in zip(procs, errs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"

    losses, epochs = [], []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert line, out
        losses.append(float(line[-1].split()[1]))
        eline = [l for l in out.splitlines() if l.startswith("EPOCH ")]
        assert eline, out
        epochs.append(tuple(float(v) for v in eline[-1].split()[1:]))
    assert losses[0] == losses[1]   # identical global computation
    assert epochs[0] == epochs[1]

    # single-process references from the SAME problem definition
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mp_train_worker import build_problem, run_epoch_surfaces, run_step
    cfg, ds, g, banks, batch = build_problem()
    ref = run_step(cfg, ds, g, banks, batch, mesh=None)
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5, atol=1e-6)

    eloss, mrr, mrr2 = epochs[0]
    assert mrr2 == mrr   # checkpoint round-trip re-eval is exact
    ref_loss, ref_mrr, _ = run_epoch_surfaces(cfg, ds, g, banks, None, "")
    # collective float reassociation only (same key -> same dropout masks)
    np.testing.assert_allclose(eloss, ref_loss, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(mrr, ref_mrr, rtol=1e-3, atol=1e-3)
