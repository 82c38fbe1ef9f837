"""Utility-layer tests: config round-trip, ConvE shape algebra, profiling
counters, logging helpers."""

import json

import numpy as np

from kgc_gcn_tpu.config import Config, dataset_preset
from kgc_gcn_tpu.models.decoders import conve_flat_size
from kgc_gcn_tpu.utils.logging import RunningAverage
from kgc_gcn_tpu.utils.profiling import StepTimer


def test_config_json_roundtrip(tmp_path):
    cfg = dataset_preset("WN18RR", batch_size=64, use_pallas=True)
    path = str(tmp_path / "params.json")
    cfg.to_json(path)
    restored = Config.from_json(path)
    assert restored == cfg
    # the file is plain json with every field present (run-record parity with
    # reference main.py:182-184)
    raw = json.load(open(path))
    assert raw["learning_rate"] == 0.002 and raw["batch_size"] == 64


def test_dataset_presets_match_reference_tuning():
    # reference experiments/<ds>/params.json historical values (SURVEY §2.4.1)
    assert dataset_preset("WN18RR").learning_rate == 0.002
    assert dataset_preset("FB15k-237").learning_rate == 0.003
    assert dataset_preset("FB15k-237").max_epoch == 400
    assert dataset_preset("Toy").seed == 2020


def test_conve_flat_size_formula():
    # reference model.py:152-154: (2*k_w - k + 1) * (k_h - k + 1) * filters
    cfg = Config()  # k_w=10, k_h=20, kernel=7, filters=200
    assert conve_flat_size(cfg) == 14 * 14 * 200
    cfg2 = Config(k_w=4, k_h=8, kernel_size=3, num_filter=8, gcn_out_dim=32)
    assert conve_flat_size(cfg2) == 6 * 6 * 8


def test_running_average():
    avg = RunningAverage()
    avg.update(2)
    avg.update(4)
    assert avg() == 3.0


def test_step_timer_excludes_warmup():
    t = StepTimer(edges_per_step=1000, n_chips=2)
    t.update(10)          # warmup marker — no interval counted yet
    t.update(10)
    assert t.steps == 10
    assert t.edges_per_s_per_chip == t.steps_per_s * 1000 / 2
    assert "steps/s" in t.report()


def test_cli_flag_precedence_over_presets():
    """Explicit CLI values override dataset presets; untouched argparse
    defaults do NOT clobber preset tuning (cli.py:config_from_args)."""
    from kgc_gcn_tpu.cli import build_parser, config_from_args

    # no flags: WN18RR preset lr (0.002) wins over the argparse default (0.001)
    args = build_parser().parse_args(["--dataset", "WN18RR"])
    cfg = config_from_args(args)
    assert cfg.learning_rate == 0.002
    assert cfg.eval_every == 2

    # explicit flag beats the preset
    args = build_parser().parse_args(
        ["--dataset", "WN18RR", "--learning_rate", "0.01",
         "--decoder", "complex", "--composition", "sub",
         "--prng_impl", "threefry", "--moment_dtype", "bfloat16"])
    cfg = config_from_args(args)
    assert cfg.learning_rate == 0.01
    assert cfg.decoder == "complex"
    assert cfg.composition == "sub"
    assert cfg.prng_impl == "threefry"
    assert cfg.moment_dtype == "bfloat16"
    assert cfg.eval_every == 2   # untouched preset survives


def test_cli_params_json_records_effective_config(tmp_path):
    """params.json written at startup reflects the EFFECTIVE config
    (reference quirk: vars(args) overwrite, SURVEY.md §2.4.1)."""
    from kgc_gcn_tpu.cli import build_parser, config_from_args
    from kgc_gcn_tpu.config import Config

    args = build_parser().parse_args(
        ["--dataset", "WN18RR", "--batch_size", "64"])
    cfg = config_from_args(args)
    p = tmp_path / "params.json"
    cfg.to_json(str(p))
    back = Config.from_json(str(p))
    assert back == cfg
    assert back.batch_size == 64 and back.learning_rate == 0.002


def test_init_embeddings_from_npz(tmp_path):
    """Warm-start replaces exactly the matching parameter tables; shape
    mismatches and key-less files fail loudly."""
    import jax
    import numpy as np
    import pytest
    from kgc_gcn_tpu.config import dataset_preset
    from kgc_gcn_tpu.models import build_model
    from kgc_gcn_tpu.models.common import init_embeddings_from_npz

    cfg = dataset_preset("Toy", gcn_in_dim=8, gcn_out_dim=32, k_w=4, k_h=8,
                         num_filter=2, kernel_size=3)
    model = build_model(cfg, 11, 3, 20, e_pad=32)
    params, _ = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ent = rng.normal(size=params.entity_embedding.shape).astype(np.float32)
    f = tmp_path / "warm.npz"
    np.savez(f, entity_embedding=ent)
    out = init_embeddings_from_npz(params, str(f))
    np.testing.assert_array_equal(np.asarray(out.entity_embedding), ent)
    np.testing.assert_array_equal(np.asarray(out.relation_embedding),
                                  np.asarray(params.relation_embedding))

    np.savez(tmp_path / "bad.npz", entity_embedding=ent[:, :4])
    with pytest.raises(ValueError, match="shape"):
        init_embeddings_from_npz(params, str(tmp_path / "bad.npz"))
    np.savez(tmp_path / "none.npz", other=ent)
    with pytest.raises(ValueError, match="none of"):
        init_embeddings_from_npz(params, str(tmp_path / "none.npz"))


def test_summarize_metrics(tmp_path):
    import json
    import sys
    sys.path.insert(0, "scripts")
    from summarize_metrics import summarize

    f = tmp_path / "metrics.jsonl"
    lines = [
        {"run_start": True, "dataset": "Toy", "max_epoch": 3, "seed": 1,
         "restored_best": 0.0},
        {"epoch": 1, "loss": 2.0, "lr": 0.01, "sec": 1.0,
         "val": {"mrr": 0.2, "mr": 5.0}},
        {"epoch": 2, "loss": 1.5, "lr": 0.01, "sec": 0.5, "steps_per_s": 10,
         "val": {"mrr": 0.5, "mr": 3.0}, "best_mrr": 0.5},
        {"run_start": True, "dataset": "Toy", "max_epoch": 1, "seed": 2,
         "restored_best": 0.5},
        {"epoch": 1, "loss": 1.2, "lr": 0.01, "sec": 0.4, "steps_per_s": 12},
    ]
    f.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    rows = summarize(str(f))
    assert len(rows) == 2
    assert rows[0]["best_val_mrr"] == 0.5 and rows[0]["best_epoch"] == 2
    assert rows[0]["epochs"] == 2 and rows[1]["epochs"] == 1
    assert rows[1]["best_val_mrr"] is None
    assert rows[0]["steps_per_s_median"] == 10


def test_fb15k_preset_defaults_to_bf16_profile():
    """--dataset FB15k-237 --do_train hits the measured-fastest config
    (fb15k_best: pallas + bf16 compute + bf16 moments) out of the box, and
    explicit flags can override it back in BOTH directions."""
    cfg = dataset_preset("FB15k-237")
    assert cfg.use_pallas and cfg.compute_dtype == "bfloat16" \
        and cfg.moment_dtype == "bfloat16"
    # WN18RR: kernels on, but FULL precision (bf16 is -10% at that shape)
    wn = dataset_preset("WN18RR")
    assert wn.use_pallas and wn.compute_dtype == "float32"

    from kgc_gcn_tpu.cli import build_parser, config_from_args
    back = config_from_args(build_parser().parse_args(
        ["--dataset", "FB15k-237", "--no_use_pallas",
         "--compute_dtype", "float32", "--moment_dtype", "float32"]))
    assert not back.use_pallas and back.compute_dtype == "float32" \
        and back.moment_dtype == "float32"
    kept = config_from_args(build_parser().parse_args(
        ["--dataset", "FB15k-237"]))
    assert kept.use_pallas and kept.compute_dtype == "bfloat16"
