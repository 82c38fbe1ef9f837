"""CLI integration: the real argv surface end-to-end in-process on CPU
(train -> restore+test -> restore+predict), using the Toy fixture written
to a temp data dir."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliwork")
    from kgc_gcn_tpu.data.toy import write_toy
    write_toy(str(root / "data"))
    return root


def _run(workdir, *argv):
    from kgc_gcn_tpu.cli import main
    args = list(argv) + [
        "--data_dir", str(workdir / "data"),
        "--experiments_dir", str(workdir / "experiments"),
        "--num_filter", "2", "--gcn_in_dim", "8", "--gcn_out_dim", "32",
        "--k_w", "4", "--k_h", "8", "--kernel_size", "3",
    ]
    return main(args)


def test_cli_train_test_predict_roundtrip(workdir, capsys):
    assert _run(workdir, "--dataset", "Toy", "--do_train",
                "--max_epoch", "2", "--eval_every", "1",
                "--ckpt_every", "1") == 0
    exp = workdir / "experiments" / "Toy"
    assert (exp / "last.ckpt").exists()
    assert (exp / "periodic.orbax").is_dir()
    assert (exp / "params.json").exists()
    cfg = json.load(open(exp / "params.json"))
    assert cfg["max_epoch"] == 2          # params.json records effective cfg

    assert _run(workdir, "--dataset", "Toy", "--do_test",
                "--restore_dir", str(exp)) == 0

    qf = workdir / "queries.txt"
    qf.write_text("e1\tr1\ne0\tr0\n")
    capsys.readouterr()                   # drop earlier output
    assert _run(workdir, "--dataset", "Toy", "--do_predict",
                "--restore_dir", str(exp),
                "--predict_file", str(qf), "--top_k", "3") == 0
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    assert len(out) == 2
    rec = json.loads(out[0])
    assert rec["subject"] == "e1" and len(rec["topk"]) == 3


def test_restore_adopts_model_shape_from_run_record(workdir):
    """--restore_dir picks the architecture flags up from the run's
    params.json so do_test/do_predict need not repeat them (explicit flags
    still win)."""
    from kgc_gcn_tpu.cli import build_parser, config_from_args

    exp = workdir / "experiments" / "Toy"   # written by the roundtrip test
    args = build_parser().parse_args(
        ["--dataset", "Toy", "--do_test", "--restore_dir", str(exp)])
    cfg = config_from_args(args)
    assert cfg.num_filter == 2 and cfg.gcn_in_dim == 8
    assert cfg.gcn_out_dim == 32 and cfg.kernel_size == 3

    args = build_parser().parse_args(
        ["--dataset", "Toy", "--do_test", "--restore_dir", str(exp),
         "--num_filter", "7"])
    cfg = config_from_args(args)
    assert cfg.num_filter == 7              # explicit flag beats the record
    assert cfg.gcn_in_dim == 8


def test_cli_trains_on_mesh(workdir):
    """--data_axis/--graph_axis build the mesh, shard graph+params+batches and
    train end-to-end on the 8-device CPU mesh from one command (the usable
    multi-chip path; the reference's counterpart is --multi_gpu ->
    DataParallel, main.py:213-214)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    assert _run(workdir, "--dataset", "Toy", "--do_train",
                "--max_epoch", "2", "--eval_every", "1",
                "--batch_size", "4",
                "--data_axis", "2", "--graph_axis", "4") == 0
    exp = workdir / "experiments" / "Toy"
    assert (exp / "last.ckpt").exists()   # trained + saved on improvement
    cfg = json.load(open(exp / "params.json"))
    assert cfg["data_axis"] == 2 and cfg["graph_axis"] == 4


def test_mesh_flag_validation(workdir):
    """The mesh-shape guards fail FAST (at startup, not after epochs of
    training or at the first eval)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    with pytest.raises(ValueError, match="entity_sharded"):
        _run(workdir, "--dataset", "Toy", "--do_train", "--max_epoch", "1",
             "--entity_sharded", "ring")          # needs graph_axis > 1
    with pytest.raises(ValueError, match="batch_size"):
        _run(workdir, "--dataset", "Toy", "--do_train", "--max_epoch", "1",
             "--data_axis", "2", "--batch_size", "5")
    with pytest.raises(ValueError, match="eval_batch_size"):
        _run(workdir, "--dataset", "Toy", "--do_train", "--max_epoch", "1",
             "--data_axis", "2", "--batch_size", "4",
             "--eval_batch_size", "5")
    with pytest.raises(ValueError, match="stacked"):
        _run(workdir, "--dataset", "Toy", "--do_train", "--max_epoch", "1",
             "--use_pallas", "--spmm_mode", "stacked",
             "--data_axis", "1", "--graph_axis", "4", "--batch_size", "4")


def test_cli_trains_entity_sharded(workdir):
    """--entity_sharded ring trains end-to-end from one command (activations
    row-sharded over the graph axis, ppermute-ring aggregation)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    assert _run(workdir, "--dataset", "Toy", "--do_train",
                "--max_epoch", "1", "--eval_every", "1",
                "--batch_size", "4",
                "--data_axis", "2", "--graph_axis", "4",
                "--entity_sharded", "ring") == 0


def test_compile_cache_dir_populates(workdir):
    """--compile_cache_dir turns on the persistent XLA compile cache and the
    run writes program entries into it (the TPU value: remote compiles cost
    minutes; a re-run with identical shapes loads from disk)."""
    import jax

    cache = workdir / "xla_cache"
    try:
        assert _run(workdir, "--dataset", "Toy", "--do_train",
                    "--max_epoch", "1", "--eval_every", "1",
                    "--compile_cache_dir", str(cache)) == 0
        entries = list(cache.rglob("*"))
        assert any(p.is_file() for p in entries), entries
        cfg = json.load(open(workdir / "experiments" / "Toy" / "params.json"))
        assert cfg["compile_cache_dir"] == str(cache)  # run record carries it
    finally:
        # global jax config — reset so later tests compile uncached
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_cli_per_relation_report(workdir):
    """--do_test --per_relation writes the per-relation table and logs the
    worst/best rows (uses the checkpoint from the roundtrip test)."""
    exp = workdir / "experiments" / "Toy"
    assert _run(workdir, "--dataset", "Toy", "--do_test",
                "--restore_dir", str(exp), "--per_relation") == 0
    rows = json.load(open(exp / "per_relation.json"))
    assert rows and all("mrr" in r and "relation" in r for r in rows)
    assert all(not r["relation"].endswith("_reverse") for r in rows)


def test_cli_profile_dir_captures_trace(workdir):
    """--profile_dir writes a device trace of one post-compile epoch."""
    prof = workdir / "prof"
    assert _run(workdir, "--dataset", "Toy", "--do_train",
                "--max_epoch", "3", "--eval_every", "3",
                "--profile_dir", str(prof)) == 0
    files = list(prof.rglob("*.trace.json.gz"))
    assert files, list(prof.rglob("*"))[:10]


def test_cli_init_embeddings_wiring(workdir):
    """--init_embeddings seeds the tables through the CLI (wrong shapes fail
    loudly before any training work)."""
    from kgc_gcn_tpu.data.dataset import load_dataset

    ds = load_dataset("Toy", str(workdir / "data"))
    rng = np.random.default_rng(0)
    good = workdir / "warm.npz"
    np.savez(good, entity_embedding=rng.normal(
        size=(ds.num_entity, 8)).astype(np.float32))  # gcn_in_dim=8 in _run
    assert _run(workdir, "--dataset", "Toy", "--do_train",
                "--max_epoch", "1", "--eval_every", "1",
                "--init_embeddings", str(good)) == 0

    bad = workdir / "bad.npz"
    np.savez(bad, entity_embedding=rng.normal(
        size=(ds.num_entity, 99)).astype(np.float32))
    with pytest.raises(ValueError, match="shape"):
        _run(workdir, "--dataset", "Toy", "--do_train",
             "--max_epoch", "1", "--init_embeddings", str(bad))


def test_maybe_default_pallas_guards():
    """TPU-first default for presetless corpora: enabled only when the user
    didn't specify AND the config is kernel-compatible AND the backend is a
    TPU (the round-3 SYN soak silently ran XLA scatter-adds without this)."""
    from kgc_gcn_tpu.cli import maybe_default_pallas
    from kgc_gcn_tpu.config import dataset_preset

    base = dataset_preset("SYN")
    assert not base.use_pallas
    assert maybe_default_pallas(base, None, "tpu").use_pallas
    # explicit user choice (either way) wins
    assert not maybe_default_pallas(base, False, "tpu").use_pallas
    # non-TPU backends keep the XLA path (interpret kernels would crawl)
    assert not maybe_default_pallas(base, None, "cpu").use_pallas
    # kernel-incompatible configs are left alone
    for kw in (dict(composition="sub"), dict(edge_sample_size=8),
               dict(entity_sharded="ring", graph_axis=2),
               dict(agg_schedule="reference")):
        assert not maybe_default_pallas(
            base.replace(**kw), None, "tpu").use_pallas
    # rgcn gained a kernel path in round 4 (fused basis kernels)
    assert maybe_default_pallas(
        base.replace(model="rgcn"), None, "tpu").use_pallas
    # ...but block mode has no kernel path (encode ignores use_pallas) —
    # auto-enabling would misreport the config as accelerated
    assert not maybe_default_pallas(
        base.replace(model="rgcn", num_blocks=4), None, "tpu").use_pallas
    # presets that already decided are untouched
    fb = dataset_preset("FB15k-237")
    assert maybe_default_pallas(fb, None, "tpu") is fb


def test_preset_pallas_yields_to_incompatible_flags():
    """A PRESET-sourced use_pallas must not make documented commands raise:
    --entity_sharded ring/boundary (etc.) silently run the XLA path, while
    an EXPLICIT --use_pallas still conflicts loudly in the model guards."""
    from kgc_gcn_tpu.cli import build_parser, config_from_args
    cfg = config_from_args(build_parser().parse_args(
        ["--dataset", "WN18RR", "--entity_sharded", "boundary",
         "--graph_axis", "4"]))
    assert not cfg.use_pallas
    cfg = config_from_args(build_parser().parse_args(
        ["--dataset", "WN18RR", "--composition", "sub"]))
    assert not cfg.use_pallas
    # explicit flag is preserved (the model will raise its targeted error)
    cfg = config_from_args(build_parser().parse_args(
        ["--dataset", "WN18RR", "--use_pallas", "--entity_sharded", "ring",
         "--graph_axis", "4"]))
    assert cfg.use_pallas
    # gather composes with the kernels - preset value kept
    cfg = config_from_args(build_parser().parse_args(
        ["--dataset", "WN18RR", "--entity_sharded", "gather",
         "--graph_axis", "4"]))
    assert cfg.use_pallas
