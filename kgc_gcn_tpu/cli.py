"""Experiment CLI — flag-compatible with the reference driver.

``python -m kgc_gcn_tpu.cli --dataset WN18RR --do_train --do_test`` mirrors
``python main.py ...`` (reference main.py:18-46,177-239): every reference flag
is accepted with the same name and default, the effective config is written to
``experiments/<ds>/params.json``, logging goes to console +
``experiments/<ds>/train.log``, and train/test are mutually exclusive.
TPU-native additions: model/decoder family, decomposition, mesh axes, dtype,
Pallas kernel toggle.
"""

from __future__ import annotations

import argparse
import logging
import os
import random

import jax
import numpy as np

from kgc_gcn_tpu.config import Config, dataset_preset
from kgc_gcn_tpu.data.batching import make_banks
from kgc_gcn_tpu.data.dataset import load_dataset
from kgc_gcn_tpu.data.graph import build_graph
from kgc_gcn_tpu.models import build_model
from kgc_gcn_tpu.train.checkpoint import load_checkpoint
from kgc_gcn_tpu.train.loop import Trainer, train_and_evaluate
from kgc_gcn_tpu.train.optim import make_optimizer
from kgc_gcn_tpu.utils.logging import set_logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flags (reference main.py:18-46)
    p.add_argument("--dataset", default="WN18RR")
    p.add_argument("--seed", default=19960326, type=int)
    p.add_argument("--restore_dir", default=None)
    p.add_argument("--restore_torch", default=None,
                   help="import a reference (PyTorch) last.ckpt file")
    p.add_argument("--init_embeddings", default=None,
                   help="warm-start entity/relation embedding tables from "
                        "an .npz with parameter-shaped 'entity_embedding' / "
                        "'relation_embedding' arrays (checkpoint restore "
                        "still wins if both are given)")
    p.add_argument("--multi_gpu", action="store_true",
                   help="accepted for parity; sharding is controlled by --data_axis/--graph_axis")
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--max_epoch", default=500, type=int)
    p.add_argument("--min_epoch", default=50, type=int)
    p.add_argument("--eval_every", default=1, type=int)
    p.add_argument("--ckpt_every", default=0, type=int,
                   help="async periodic checkpoint every K epochs (0=off)")
    p.add_argument("--patience", default=0.001, type=float)
    p.add_argument("--patience_num", default=-1, type=int)
    p.add_argument("--learning_rate", default=0.001, type=float)
    p.add_argument("--lr_schedule", default="step",
                   choices=["step", "cosine", "constant"],
                   help="per-epoch lr schedule (step = reference StepLR)")
    p.add_argument("--warmup_epochs", default=0, type=int)
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--lbl_smooth", default=0.1, type=float)
    p.add_argument("--num_workers", default=0, type=int,
                   help="accepted for parity; batching is on-device, no workers exist")
    p.add_argument("--bias", action="store_true")
    p.add_argument("--gcn_in_dim", default=100, type=int)
    p.add_argument("--gcn_out_dim", default=200, type=int)
    p.add_argument("--gcn_drop", default=0.3, type=float)
    p.add_argument("--hidden_drop", default=0.3, type=float)
    p.add_argument("--feat_drop", default=0.3, type=float)
    p.add_argument("--k_w", default=10, type=int)
    p.add_argument("--k_h", default=20, type=int)
    p.add_argument("--num_filter", default=200, type=int)
    p.add_argument("--kernel_size", default=7, type=int)
    p.add_argument("--clip_grad", default=1.0, type=float)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--do_predict", action="store_true",
                   help="serve top-k link prediction from a checkpoint "
                        "(kgc_gcn_tpu/serve.py)")
    p.add_argument("--predict_file", default=None,
                   help="TSV of 'subject relation' query lines for --do_predict")
    p.add_argument("--top_k", default=10, type=int)
    p.add_argument("--per_relation", action="store_true",
                   help="with --do_test: also report per-relation filtered "
                        "metrics (worst/best in the log, full table to "
                        "<experiments>/<ds>/per_relation.json)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of one "
                        "post-compile training epoch into this directory")
    p.add_argument("--bi_direction", action="store_false",
                   help="accepted for parity; the graph is always bidirectional "
                        "(the reference flag is dead too, data_loader.py:113-114)")
    # TPU-native flags
    p.add_argument("--model", default="mgcn",
                   choices=["mgcn", "rgcn", "rgat"])
    p.add_argument("--num_heads", default=1, type=int,
                   help="rgat: attention heads (divides gcn_out_dim)")
    p.add_argument("--decoder", default="conve",
                   choices=["conve", "distmult", "transe", "complex",
                            "rotate"])
    p.add_argument("--num_layers", default=1, type=int)
    p.add_argument("--composition", default="mult",
                   choices=["mult", "sub", "corr"],
                   help="entity-relation message composition (CompGCN family)")
    p.add_argument("--num_bases", default=0, type=int)
    p.add_argument("--num_blocks", default=0, type=int,
                   help="rgcn: block-diagonal relation weights (0 = basis "
                        "mode).  PARITY-ONLY path: measured 1.62 steps/s at "
                        "FB15k config 3 vs 22.9 for basis kernels (round 5, "
                        "bench.py rgcn_block) — the per-edge weight gather "
                        "+ tiny batched einsums have no MXU-friendly "
                        "schedule; prefer --num_bases")
    p.add_argument("--train_mode", default="one_vs_all",
                   choices=["one_vs_all", "negative_sampling"])
    p.add_argument("--num_negatives", default=64, type=int)
    p.add_argument("--neg_loss", default="bce",
                   choices=["bce", "margin", "self_adversarial"],
                   help="negative_sampling objective (ops/losses.py): BCE "
                        "over 1+K logits, hinge ranking, or RotatE "
                        "self-adversarial weighting")
    p.add_argument("--neg_margin", default=1.0, type=float)
    p.add_argument("--neg_adversarial_temp", default=1.0, type=float)
    p.add_argument("--edge_sample_size", default=0, type=int,
                   help="per-half per-step edge subsample K (0 = full "
                        "graph).  Unbiased (E/K-rescaled, with-replacement) "
                        "but UNSORTED, so aggregation runs XLA's unsorted "
                        "scatter and the kernel path is off.  Measured "
                        "round 5 (bench.py sampled, WN18RR scale): K=E/8 "
                        "157 steps/s vs full-graph kernels 129 (+22%); "
                        "K=E/4 134 (break-even); K=E/2 93 (loses) — pays "
                        "only when K <= E/4, at a gradient-variance cost "
                        "the full-graph path does not have")
    p.add_argument("--loss_impl", default="auto",
                   choices=["auto", "dense", "sparse", "fused"],
                   help="one-vs-all BCE implementation (ops/fused_loss.py)")
    # None default = "not specified": presets may set these (FB15k-237
    # defaults to the bf16 profile), and an explicit flag must be able to
    # override the preset in BOTH directions — a concrete parser default
    # would make `--compute_dtype float32` indistinguishable from absent
    p.add_argument("--moment_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage dtype (train/optim.py)")
    p.add_argument("--prng_impl", default="rbg",
                   choices=["threefry", "rbg", "unsafe_rbg"],
                   help="dropout PRNG (rbg = TPU hardware RNG instruction, "
                        "+17%% measured; threefry = jax default stream)")
    p.add_argument("--bwd_perm", default="contrib",
                   choices=["contrib", "operands", "fwdw"],
                   help="backward d_x permutation strategy in the pallas "
                        "path (ops/spmm_pallas.py)")
    p.add_argument("--rel_compose", default="gather",
                   choices=["gather", "onehot"],
                   help="relation-row materialization in the pallas path")
    p.add_argument("--compute_dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", dest="use_pallas", action="store_const",
                   const=True, default=None)
    p.add_argument("--no_use_pallas", dest="use_pallas",
                   action="store_const", const=False,
                   help="force the plain-XLA aggregation path (overrides "
                        "presets that default to the kernels)")
    p.add_argument("--spmm_mode", default="halves",
                   choices=["halves", "stacked", "stacked_xla"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the encoder in the backward. "
                        "MEASURED NEGATIVE at the reference 1-layer config: "
                        "-22%% steps/s AND higher peak HBM at every scale "
                        "(XLA memory analysis, scripts/remat_probe.py — the "
                        "backward's per-edge workspace dominates either "
                        "way). To fit bigger graphs on a 16 GB v5e (plain "
                        "path OOMs near N~1M, E~2M at reference dims) use "
                        "--entity_sharded / --graph_axis (shards activations "
                        "AND tables) or --moment_dtype bfloat16 instead; "
                        "at num_layers=2 it saved ~1%% peak (still net-negative)")
    p.add_argument("--no_scan_epoch", action="store_true")
    p.add_argument("--eval_batch_size", default=0, type=int)
    p.add_argument("--data_axis", default=1, type=int)
    p.add_argument("--graph_axis", default=1, type=int)
    p.add_argument("--entity_sharded", default="none",
                   choices=["none", "gather", "ring", "boundary"],
                   help="also shard the entity activations over the graph "
                        "axis (all_gather+psum_scatter, ppermute-ring, or "
                        "the boundary-compressed overlapped exchange; "
                        "needs --graph_axis > 1)")
    p.add_argument("--partition", default="contiguous",
                   choices=["contiguous", "locality"],
                   help="entity numbering: 'locality' renumbers entities "
                        "with label-propagation community ordering of the "
                        "train graph so the multi-chip entity shards cluster "
                        "(shrinks the --entity_sharded boundary exchange); "
                        "isomorphic relabel — results identical in "
                        "distribution")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--experiments_dir", default="experiments")
    p.add_argument("--compile_cache_dir", default="",
                   help="persistent XLA compilation cache directory, shared "
                        "across runs (compiles cost minutes on remote TPU; "
                        "identical program shapes then load in seconds)")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = dataset_preset(args.dataset)
    overrides = {}
    defaults = build_parser().parse_args([])
    for field in (
        "seed restore_dir restore_torch batch_size max_epoch min_epoch "
        "eval_every ckpt_every patience "
        "patience_num learning_rate lr_schedule warmup_epochs weight_decay "
        "lbl_smooth bias gcn_in_dim "
        "gcn_out_dim gcn_drop hidden_drop feat_drop k_w k_h num_filter "
        "kernel_size clip_grad do_train do_test model decoder num_layers "
        "num_bases num_blocks num_heads composition train_mode num_negatives "
        "neg_loss neg_margin neg_adversarial_temp "
        "edge_sample_size remat "
        "compute_dtype use_pallas spmm_mode loss_impl moment_dtype prng_impl "
        "rel_compose bwd_perm eval_batch_size data_axis graph_axis "
        "entity_sharded partition data_dir experiments_dir compile_cache_dir"
    ).split():
        val = getattr(args, field)
        # explicit CLI values override the preset; untouched defaults do not
        if val != getattr(defaults, field):
            overrides[field] = val
    overrides["scan_epoch"] = not args.no_scan_epoch

    # restoring a checkpoint: adopt the MODEL-SHAPE fields recorded in the
    # run's params.json unless the user passed them explicitly — repeating
    # every architecture flag on --do_test/--do_predict is a silent-shape-
    # mismatch trap (the reference requires the flags to be repeated)
    if args.restore_dir:
        run_record = os.path.join(args.restore_dir, "params.json")
        if os.path.exists(run_record):
            saved = Config.from_json(run_record)
            shape_fields = (
                "model decoder num_layers num_bases num_blocks num_heads "
                "composition partition "
                "bias gcn_in_dim gcn_out_dim k_w k_h num_filter kernel_size"
            ).split()
            for field in shape_fields:
                if field not in overrides:   # explicit flags still win
                    overrides[field] = getattr(saved, field)
    cfg = cfg.replace(**overrides)

    # a PRESET-sourced use_pallas must yield to explicitly-requested
    # features the kernels cannot serve — otherwise the documented
    # `--entity_sharded ring|boundary` (etc.) commands would raise on a
    # flag the user never passed.  An EXPLICIT --use_pallas still conflicts
    # loudly (the model's own guards raise).
    if cfg.use_pallas and "use_pallas" not in overrides and (
            cfg.entity_sharded in ("ring", "boundary")
            or cfg.composition != "mult"
            or cfg.edge_sample_size > 0
            or cfg.agg_schedule != "fused"
            or (cfg.spmm_mode != "halves" and cfg.graph_axis > 1)):
        logging.info("preset use_pallas yields to a kernel-incompatible "
                     "flag; running the XLA aggregation path")
        cfg = cfg.replace(use_pallas=False)
    return cfg


def maybe_default_pallas(cfg: Config, explicit, backend: str) -> Config:
    """TPU-first default for configs that did not opt in via preset or flag:
    enable the Pallas kernel path when the backend is a TPU, the user didn't
    specify, and the configuration is kernel-compatible (mirrors the mgcn.py
    guards).  The WN18RR/FB15k-237 presets already carry it; this catches
    custom datasets (and presets without the flag, e.g. Toy) that would
    otherwise silently train on the slow path (caught by the round-3 SYN
    soak trace: the epoch ran XLA scatter-adds)."""
    if (explicit is None and not cfg.use_pallas and backend == "tpu"
            and cfg.model in ("mgcn", "rgat", "rgcn")
            # rgcn block mode has no kernel path (encode ignores use_pallas)
            # so auto-enabling would misreport the config as accelerated
            and (cfg.model != "rgcn" or cfg.num_blocks == 0)
            and cfg.composition == "mult"
            and cfg.edge_sample_size == 0
            and cfg.agg_schedule == "fused"
            and (cfg.spmm_mode == "halves" or cfg.graph_axis == 1)
            and cfg.entity_sharded in ("none", "gather")):
        return cfg.replace(use_pallas=True)
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    if cfg.compile_cache_dir:
        from kgc_gcn_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(cfg.compile_cache_dir)

    # multi-host pods: one process per host — join the coordination service
    # BEFORE first backend use so jax.devices() is the global set (no-op
    # unless JAX_COORDINATOR_ADDRESS is configured by the launcher)
    from kgc_gcn_tpu.parallel.distributed import maybe_initialize
    maybe_initialize()
    from kgc_gcn_tpu.utils.logging import is_host_zero

    new_cfg = maybe_default_pallas(cfg, args.use_pallas,
                                   jax.default_backend())
    if new_cfg is not cfg:
        cfg = new_cfg
        logging.info("TPU backend: enabling the Pallas kernel path "
                     "(--no_use_pallas opts out)")

    model_dir = os.path.join(cfg.experiments_dir, cfg.dataset)
    os.makedirs(model_dir, exist_ok=True)
    if is_host_zero():   # the run record is shared; don't race across hosts
        cfg.to_json(os.path.join(model_dir, "params.json"))
    set_logger(os.path.join(model_dir, "train.log"))
    logging.info("devices: %s", jax.devices())

    random.seed(cfg.seed)
    np.random.seed(cfg.seed % 2**32)

    logging.info("Loading the dataset...")
    ds = load_dataset(cfg.dataset, cfg.data_dir)
    if cfg.partition != "contiguous":
        # renumber entities for shard locality (isomorphic relabel; must
        # match between train and restore runs — adopted from params.json)
        from kgc_gcn_tpu.data.partition import partition_dataset
        ds = partition_dataset(ds, cfg.partition)
        logging.info("Applied %s entity partition", cfg.partition)
    graph = build_graph(ds.train_triples, ds.num_entity, ds.num_relation)
    banks = make_banks(ds)

    # multi-chip: build the (data x graph) mesh and edge-partition the graph
    # BEFORE any device arrays are created (the reference's one parallelism
    # knob is --multi_gpu -> DataParallel, main.py:213-214; here both axes are
    # first-class: batch sharding over `data`, edge partitioning over `graph`)
    mesh = None
    if cfg.entity_sharded != "none" and cfg.graph_axis < 2:
        raise ValueError("--entity_sharded needs --graph_axis > 1")
    if cfg.data_axis * cfg.graph_axis > 1:
        from kgc_gcn_tpu.parallel.mesh import make_mesh, shard_graph
        mesh = make_mesh(cfg.data_axis, cfg.graph_axis)
        if cfg.batch_size % cfg.data_axis:
            raise ValueError(
                f"data_axis={cfg.data_axis} must divide "
                f"batch_size={cfg.batch_size}")
        eval_bs = cfg.eval_batch_size or cfg.batch_size
        if eval_bs % cfg.data_axis:
            # fail NOW, not at the first eval after epochs of training
            raise ValueError(
                f"data_axis={cfg.data_axis} must divide "
                f"eval_batch_size={eval_bs}")
        if graph.e_pad % cfg.graph_axis:
            raise ValueError(
                f"graph_axis={cfg.graph_axis} must divide the padded edge "
                f"count {graph.e_pad} (powers of two up to "
                f"{graph.e_pad} always do)")
        graph = shard_graph(graph, mesh)
        logging.info("mesh: data=%d x graph=%d over %d device(s)",
                     cfg.data_axis, cfg.graph_axis, mesh.size)

    model = build_model(cfg, ds.num_entity, ds.num_relation, ds.num_edge,
                        e_pad=graph.e_pad, mesh=mesh)
    params, state = model.init(jax.random.PRNGKey(cfg.seed % 2**32))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    if cfg.train_mode == "negative_sampling":
        from kgc_gcn_tpu.train.negative import NegativeSamplingTrainer
        trainer = NegativeSamplingTrainer(cfg, model, graph, banks, mesh=mesh)
    else:
        trainer = Trainer(cfg, model, graph, banks, mesh=mesh)

    if args.init_embeddings:
        from kgc_gcn_tpu.models.common import init_embeddings_from_npz
        params = init_embeddings_from_npz(params, args.init_embeddings)
        logging.info("Initialized embedding tables from %s",
                     args.init_embeddings)
        if cfg.partition != "contiguous":
            logging.warning(
                "--init_embeddings rows are keyed by entity id and "
                "--partition %s RENUMBERS entities: the table must already "
                "be in the partitioned numbering (export it from a run with "
                "the same partition)", cfg.partition)

    best = 0.0
    if cfg.restore_torch is not None:
        from kgc_gcn_tpu.utils.torch_import import load_reference_checkpoint
        if (cfg.model, cfg.decoder, cfg.num_layers) != ("mgcn", "conve", 1):
            raise ValueError("--restore_torch imports the reference "
                             "architecture only (model=mgcn decoder=conve "
                             "num_layers=1)")
        params, state, best = load_reference_checkpoint(cfg.restore_torch, graph)
        # the imported pytree may differ structurally from model.init's (e.g.
        # bias leaves) — rebuild optimizer state for it
        opt_state = tx.init(params)
        logging.info("Imported reference checkpoint %s (measure: %s)",
                     cfg.restore_torch, best)
    if cfg.restore_dir is not None:
        tree, best = load_checkpoint(
            cfg.restore_dir,
            {"params": params, "state": state, "opt_state": opt_state})
        params, state, opt_state = tree["params"], tree["state"], tree["opt_state"]
        logging.info("Restored model from %s with best measure: %s",
                     cfg.restore_dir, best)

    if mesh is not None:
        # place params/state/opt on the mesh AFTER any restore (restored
        # leaves arrive as host arrays): per-edge tables shard row-aligned
        # with the edge partition, everything else replicates
        from kgc_gcn_tpu.parallel.mesh import shard_params
        params = shard_params(params, mesh)
        state = shard_params(state, mesh)
        opt_state = shard_params(opt_state, mesh)

    if cfg.do_train and cfg.do_test:
        raise ValueError("Can not perform training and testing at one time")
    if args.do_predict:   # validate BEFORE any training work happens
        if cfg.restore_dir is None and cfg.restore_torch is None:
            raise ValueError("Must specify restore dir for prediction")
        if not args.predict_file:
            raise ValueError("--do_predict needs --predict_file")
    if cfg.do_train:
        params, state, opt_state, best = train_and_evaluate(
            trainer, params, state, opt_state, model_dir, best,
            seed=cfg.seed % 2**32, profile_dir=args.profile_dir)
    if cfg.do_test:
        if cfg.restore_dir is None and cfg.restore_torch is None:
            raise ValueError("Must specify restore dir for testing")
        if args.per_relation:
            # ONE ranking pass serves both reports: the corpus metrics are
            # the count-weighted mean of the per-relation ones (exact;
            # tests/test_train.py pins the equality)
            from kgc_gcn_tpu.ops.ranking import corpus_from_per_rel
            from kgc_gcn_tpu.train.loop import log_metrics
            per = trainer.evaluate_per_relation(params, state, "test")
            log_metrics("Test", corpus_from_per_rel(per))
            id2rel = {i: r for r, i in ds.relation2id.items()
                      if i < ds.num_relation}
            rows = [
                {"relation": id2rel[i], "count": int(per["count"][i]),
                 **{k: (None if np.isnan(v[i]) else round(float(v[i]), 5))
                    for k, v in per.items() if k != "count"}}
                for i in range(ds.num_relation)]
            if is_host_zero():
                import json
                with open(os.path.join(model_dir, "per_relation.json"),
                          "w") as f:
                    json.dump(rows, f, indent=2)
            ranked = sorted((r for r in rows if r["count"]),
                            key=lambda r: r["mrr"])
            worst = ranked[:5]
            best = [r for r in ranked[-5:] if r not in worst]
            for tag, sel in (("worst", worst), ("best", best)):
                for r in sel:
                    logging.info("- per-relation (%s): %s  mrr=%.3f "
                                 "hits@10=%.3f n=%d", tag, r["relation"],
                                 r["mrr"], r["hits@10"], r["count"])
        else:
            trainer.evaluate(params, state, "test", mark="Test")
    if args.do_predict:
        from kgc_gcn_tpu.serve import Predictor, serve_file, serve_stream
        predictor = Predictor(cfg, model, graph, params, state,
                              ds.entity2id, ds.relation2id)
        if args.predict_file == "-":
            import sys
            for line in serve_stream(predictor, sys.stdin, k=args.top_k):
                print(line, flush=True)   # one JSON line per query, streamed
        else:
            for line in serve_file(predictor, args.predict_file,
                                   k=args.top_k):
                print(line)   # stdout is the serving contract (train.log has
                              # the run context; duplicating doubles output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
