"""Training and evaluation loops.

TPU-native restructuring of the reference driver (reference main.py:49-174):

  * One training EPOCH is one jit-compiled ``lax.scan`` over shuffled batch
    indices — forward, loss, backward, clip, Adam update all on device, zero
    host sync per batch (the reference syncs every batch for tqdm,
    main.py:74).  The host only supplies the shuffled index plan and the
    per-epoch learning rate.
  * Evaluation encodes the graph ONCE per pass and scans the decoder over
    batches; ranks come from the comparison-count kernel (ops/ranking.py).
    The reference re-runs the full-graph encoder for every eval batch.
  * Early stopping, best-on-val-MRR checkpointing, and the patience rule are
    behavior-identical to reference main.py:138-174 (including the quirk that
    an improvement smaller than ``patience`` still increments the counter).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kgc_gcn_tpu.config import Config
from kgc_gcn_tpu.data.batching import QueryBank, build_labels, epoch_batches
from kgc_gcn_tpu.data.graph import Graph
from kgc_gcn_tpu.ops.fused_loss import fused_score_bce, sparse_bce_with_logits
from kgc_gcn_tpu.ops.losses import bce_with_logits
from kgc_gcn_tpu.ops.ranking import combine_head_tail, filtered_ranks, rank_metrics
from kgc_gcn_tpu.train.checkpoint import (
    save_checkpoint, save_checkpoint_async, wait_for_async_checkpoints)
from kgc_gcn_tpu.train.optim import apply_updates_with_lr, epoch_lr, make_optimizer


def root_key(cfg: Config, seed: int) -> jax.Array:
    """Training-step PRNG root key honoring ``cfg.prng_impl``.

    threefry (jax default) is recomputed as pure VPU math inside every fusion
    consuming a dropout mask — traced as the single largest matmul-fusion
    cost at WN18RR scale; rbg lowers to the TPU hardware RngBitGenerator."""
    if cfg.prng_impl == "threefry":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=cfg.prng_impl)


class Trainer:
    """Owns the jitted train/eval programs for one (model, graph) pair."""

    def __init__(self, cfg: Config, model, graph: Graph,
                 banks: Dict[str, QueryBank], mesh=None):
        self.cfg = cfg
        self.model = model
        self.graph = graph
        self.banks = banks
        self.tx = make_optimizer(cfg)
        self.n_ent = graph.n_ent
        self.mesh = mesh  # set by kgc_gcn_tpu.parallel for sharded training
        if (getattr(cfg, "entity_sharded", "none") != "none"
                and hasattr(model, "prepare_entity_sharding")):
            # host-side ring/gather schedule metadata (must happen outside jit)
            model.prepare_entity_sharding(graph)
        if (cfg.use_pallas and mesh is not None
                and getattr(cfg, "entity_sharded", "none") == "none"
                and hasattr(model, "prepare_edge_sharding")):
            # per-shard CSR metadata so Pallas kernels ride the edge partition
            # (entity_sharded builds its own kernel schedule instead)
            model.prepare_edge_sharding(graph)
        if hasattr(model, "prepare_kernels"):
            # host-side kernel layout metadata (e.g. the RGCN basis backward
            # band plan) — must be built outside jit from the static graph
            model.prepare_kernels(graph)

        self._train_epoch_jit = jax.jit(
            self._train_epoch, donate_argnums=(0, 1, 2))
        self._train_step_jit = jax.jit(
            self._train_step, donate_argnums=(0, 1, 2))
        self._eval_pass_jit = jax.jit(self._eval_pass)
        self._eval_rel_pass_jit = jax.jit(self._eval_rel_pass)
        self.loss_impl = self._resolve_loss_impl(cfg, model)

    @staticmethod
    def _resolve_loss_impl(cfg: Config, model) -> str:
        impl = cfg.loss_impl
        if impl == "auto":
            # sparse measured == dense in steps/s (ab_loss.py 2026-08-18:
            # 104.9 vs 105.6, within session noise) but never materializes the
            # (B, N) label matrix; the Pallas classifier ("fused") measured
            # slightly SLOWER at B=128 (f32 in-kernel matmuls cost more than
            # the ~26us/pass (B, N) HBM traffic they avoid) — it is opt-in for
            # large-batch / large-vocab regimes where (B, N) stops fitting
            impl = "sparse"
        if impl in ("sparse", "fused"):
            from kgc_gcn_tpu.models.decoders import QUERY_TRUNKS
            if (not hasattr(model, "query_and_bias")
                    or cfg.decoder not in QUERY_TRUNKS):
                if cfg.loss_impl != "auto":
                    # the user asked for sparse/fused explicitly (e.g. to avoid
                    # the (B, N) logits matrix) — make the fallback visible
                    logging.warning(
                        "loss_impl=%s requires a decoder with an "
                        "h @ all_ent.T + bias query trunk; decoder=%s has "
                        "none — falling back to the dense (B, N) loss",
                        cfg.loss_impl, cfg.decoder)
                impl = "dense"   # decoder without an h @ all_ent.T + bias form
        return impl

    @property
    def steps_per_epoch(self) -> int:
        """Optimizer steps per epoch (subclasses with other epoch shapes
        override — e.g. negative sampling iterates positive triples)."""
        return -(-self.banks["train"].n_queries // self.cfg.batch_size)

    # ------------------------------------------------------------- train step

    def _loss_and_update(self, params, state, opt_state, graph, lr, q,
                         label_idx, mask, rng):
        def loss_fn(p):
            rngs = self.model.make_rngs(rng)
            encode = lambda p_: self.model.encode(
                p_, state, graph, train=True, rngs=rngs)
            if self.cfg.remat:
                # rematerialize the full-graph encoder in the backward: its
                # (N, d) activations (+ the (E, d) message intermediates that
                # autodiff would otherwise keep) are recomputed instead of
                # stored — the standard FLOPs-for-HBM trade for graphs whose
                # activation footprint crowds out the optimizer state
                encode = jax.checkpoint(encode)
            all_ent, all_rel, enc_aux = encode(p)
            if self.loss_impl in ("sparse", "fused"):
                h, ent_bias, dec_state = self.model.query_and_bias(
                    p, state, all_ent, all_rel, q[:, 0], q[:, 1],
                    train=True, rngs=rngs)
                new_state = self.model.rebuild_state(state, enc_aux, dec_state)
                if self.loss_impl == "fused":
                    loss = fused_score_bce(
                        h, all_ent, ent_bias, label_idx,
                        self.cfg.lbl_smooth, mask,
                        interpret=jax.default_backend() != "tpu")
                else:
                    from kgc_gcn_tpu.models.common import mm
                    logits = mm(h, all_ent.T, self.cfg.compute_dtype) \
                        + ent_bias[None, :]
                    loss = sparse_bce_with_logits(
                        logits, label_idx, self.cfg.lbl_smooth, mask)
                return loss, new_state
            lbl = build_labels(label_idx, self.n_ent, self.cfg.lbl_smooth)
            logits, dec_state = self.model.decode(
                p, state, all_ent, all_rel, q[:, 0], q[:, 1],
                train=True, rngs=rngs)
            new_state = self.model.rebuild_state(state, enc_aux, dec_state)
            return bce_with_logits(logits, lbl, mask), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self.tx.update(grads, opt_state, params)
        new_params = apply_updates_with_lr(params, updates, lr)
        return new_params, new_state, new_opt, loss

    def _train_step(self, params, state, opt_state, graph, lr, q, label_idx,
                    mask, rng):
        return self._loss_and_update(
            params, state, opt_state, graph, lr, q, label_idx, mask, rng)

    def _train_epoch(self, params, state, opt_state, graph, rng, lr,
                     idx, mask, queries, label_idx):
        """One epoch as a single lax.scan; batches are gathers from the bank."""

        def body(carry, batch):
            params, state, opt_state, key = carry
            b_idx, b_mask = batch
            key, sub = jax.random.split(key)
            q = queries[b_idx]
            params, state, opt_state, loss = self._loss_and_update(
                params, state, opt_state, graph, lr, q, label_idx[b_idx],
                b_mask, sub)
            return (params, state, opt_state, key), loss

        (params, state, opt_state, _), losses = jax.lax.scan(
            body, (params, state, opt_state, rng), (idx, mask))
        return params, state, opt_state, losses   # (steps,) per-step losses

    def train_epoch(self, params, state, opt_state, epoch: int,
                    host_rng: np.random.Generator, rng_key: jax.Array):
        """Run one epoch; returns (params, state, opt_state, mean_loss)."""
        cfg = self.cfg
        bank = self.banks["train"]
        lr = jnp.float32(epoch_lr(cfg, epoch))
        idx, mask = epoch_batches(bank.n_queries, cfg.batch_size, host_rng)
        if self.mesh is not None:
            # shard the (steps, B) plan over the data axis so every step's
            # batch is split across data-parallel devices up front
            from kgc_gcn_tpu.parallel.mesh import shard_batches
            idx, mask = shard_batches(self.mesh, jnp.asarray(idx),
                                      jnp.asarray(mask))
        else:
            idx, mask = jnp.asarray(idx), jnp.asarray(mask)

        if cfg.scan_epoch:
            params, state, opt_state, losses = self._train_epoch_jit(
                params, state, opt_state, self.graph, rng_key, lr, idx, mask,
                bank.queries, bank.label_idx)
            return params, state, opt_state, float(jnp.mean(losses))

        losses = []
        key = rng_key
        for s in range(idx.shape[0]):
            key, sub = jax.random.split(key)
            q = bank.queries[idx[s]]
            params, state, opt_state, loss = self._train_step_jit(
                params, state, opt_state, self.graph, lr, q,
                bank.label_idx[idx[s]], mask[s], sub)
            losses.append(loss)
        return params, state, opt_state, float(jnp.mean(jnp.stack(losses)))

    # ------------------------------------------------------------- evaluation

    def _eval_pass_with(self, metric_fn, params, state, graph, idx, mask,
                        queries, label_idx):
        """Encode once, scan the decoder over batches; metric_fn(ranks, q,
        b_mask) -> pytree of partial sums (accumulated across batches)."""
        all_ent, all_rel, _ = self.model.encode(
            params, state, graph, train=False)

        def body(carry, batch):
            b_idx, b_mask = batch
            q = queries[b_idx]
            logits, _ = self.model.decode(
                params, state, all_ent, all_rel, q[:, 0], q[:, 1], train=False)
            ranks = filtered_ranks(logits, q[:, 2], label_idx[b_idx])
            m = metric_fn(ranks, q, b_mask)
            return jax.tree.map(jnp.add, carry, m), None

        zero = metric_fn(jnp.ones((1,), jnp.int32),
                         jnp.ones((1, 3), jnp.int32), jnp.zeros((1,)))
        zeros = jax.tree.map(jnp.zeros_like, zero)
        sums, _ = jax.lax.scan(body, zeros, (idx, mask))
        return sums

    def _eval_pass(self, params, state, graph, idx, mask, queries, label_idx):
        """Corpus-level metric sums (reference main.py:80-103)."""
        return self._eval_pass_with(
            lambda ranks, q, m: rank_metrics(ranks, m),
            params, state, graph, idx, mask, queries, label_idx)

    def _eval_rel_pass(self, params, state, graph, idx, mask, queries,
                       label_idx):
        """Per-relation (R,) metric sums (rel % R folds head onto forward)."""
        from kgc_gcn_tpu.ops.ranking import rank_metric_sums_by_rel
        n_rel = self.model.n_rel
        return self._eval_pass_with(
            lambda ranks, q, m: rank_metric_sums_by_rel(
                ranks, q[:, 1], m, n_rel),
            params, state, graph, idx, mask, queries, label_idx)

    def _batch_plan(self, bank: QueryBank):
        """Deterministic (steps, B) eval batch plan, sharded under a mesh."""
        bs = self.cfg.eval_batch_size or self.cfg.batch_size
        idx, mask = epoch_batches(
            bank.n_queries, bs, np.random.default_rng(0), shuffle=False)
        if self.mesh is not None:
            from kgc_gcn_tpu.parallel.mesh import shard_batches
            return shard_batches(self.mesh, jnp.asarray(idx),
                                 jnp.asarray(mask))
        return jnp.asarray(idx), jnp.asarray(mask)

    def _predict(self, params, state, bank: QueryBank) -> Dict[str, float]:
        idx, mask = self._batch_plan(bank)
        sums = self._eval_pass_jit(
            params, state, self.graph, idx, mask,
            bank.queries, bank.label_idx)
        return {k: float(v) for k, v in sums.items()}

    def evaluate_per_relation(self, params, state, split: str = "valid"
                              ) -> Dict[str, "np.ndarray"]:
        """Per-relation filtered metrics (framework extension): dict of (R,)
        arrays keyed count/mr/mrr/hits@{1,3,10}, head+tail combined onto the
        forward relation id; relations with no eval queries are NaN."""
        from kgc_gcn_tpu.ops.ranking import combine_head_tail_by_rel
        sums = {}
        for d in ("tail", "head"):
            bank = self.banks[f"{split}_{d}"]
            idx, mask = self._batch_plan(bank)
            sums[d] = self._eval_rel_pass_jit(
                params, state, self.graph, idx, mask,
                bank.queries, bank.label_idx)
        return combine_head_tail_by_rel(sums["tail"], sums["head"])

    def evaluate(self, params, state, split: str = "valid",
                 mark: str = "Val") -> Dict[str, float]:
        """Filtered MR/MRR/Hits over tail + head queries (reference main.py:80-103)."""
        tail = self._predict(params, state, self.banks[f"{split}_tail"])
        head = self._predict(params, state, self.banks[f"{split}_head"])
        results = combine_head_tail(tail, head)
        log_metrics(mark, results)
        return results


def log_metrics(mark: str, results: Dict[str, float]) -> None:
    """The reference's metric log line (main.py:98-103 format)."""
    logging.info("- %s metrics: %s  ", mark,
                 "; ".join(f"{k}: {v:05.3f}" for k, v in results.items()))


def train_and_evaluate(
    trainer: Trainer,
    params,
    state,
    opt_state,
    model_dir: Optional[str] = None,
    saved_best: float = 0.0,
    seed: int = 0,
    profile_dir: Optional[str] = None,
    profile_epoch: int = 2,
) -> Tuple[Any, Any, Any, float]:
    """Epoch driver with eval-every, best-tracking and early stop
    (reference main.py:138-174)."""
    cfg = trainer.cfg
    best_measure = saved_best
    patience_counter = 0
    host_rng = np.random.default_rng(seed)
    key = root_key(cfg, seed)

    import json

    from kgc_gcn_tpu.utils.logging import is_host_zero
    metrics_path = (os.path.join(model_dir, "metrics.jsonl")
                    if model_dir is not None and is_host_zero() else None)

    def record(rec):
        """Append one JSON line per epoch to <model_dir>/metrics.jsonl — the
        machine-readable run history (train.log is the human-readable one).
        """
        if metrics_path is not None:
            with open(metrics_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    # run-start marker: the file appends across runs in the same model_dir
    # (retrain, restore+continue), so consumers split runs on these lines
    # instead of misreading duplicate epoch numbers
    record({"run_start": True, "dataset": cfg.dataset,
            "max_epoch": cfg.max_epoch, "seed": seed,
            "restored_best": saved_best})

    from kgc_gcn_tpu.utils.profiling import StepTimer
    steps_per_epoch = trainer.steps_per_epoch
    timer = StepTimer(trainer.graph.num_messages,
                      n_chips=trainer.mesh.size if trainer.mesh else 1)

    logging.info("Starting training for %d epoch(s)", cfg.max_epoch)
    import contextlib
    for epoch in range(1, cfg.max_epoch + 1):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        profiled = bool(profile_dir) and epoch == profile_epoch
        if profiled:
            # trace one post-compile epoch (epoch 1 is compile-dominated);
            # view with xprof/TensorBoard or scripts/trace_step.py's parser
            from kgc_gcn_tpu.utils.profiling import trace
            ctx = trace(profile_dir)
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            params, state, opt_state, loss = trainer.train_epoch(
                params, state, opt_state, epoch, host_rng, sub)
        if profiled:
            logging.info("Captured device trace of epoch %d -> %s",
                         epoch, profile_dir)
        dt = time.perf_counter() - t0    # train only (train_epoch host-syncs)
        if epoch > 1 and not profiled:   # exclude compile + trace-dump epochs
            timer.add(dt, steps_per_epoch)
        logging.info("Epoch %d/%d  loss=%07.5f  (%.2fs%s)",
                     epoch, cfg.max_epoch, loss, dt,
                     f", {timer.report()}" if epoch > 1 else "")
        rec = {"epoch": epoch, "loss": round(loss, 6),
               "lr": epoch_lr(cfg, epoch), "sec": round(dt, 3)}
        if epoch > 1 and not profiled:
            rec["steps_per_s"] = round(steps_per_epoch / dt, 2)

        if (cfg.ckpt_every > 0 and model_dir is not None
                and epoch % cfg.ckpt_every == 0):
            # crash insurance on a fixed cadence, written asynchronously —
            # in ADDITION to the reference's save-on-improvement best ckpt
            save_checkpoint_async(
                model_dir, {"params": params, "state": state,
                            "opt_state": opt_state}, best_measure)

        if epoch % cfg.eval_every == 0:
            val = trainer.evaluate(params, state, "valid", mark="Val")
            rec["val"] = val
            improve = val["mrr"] - best_measure
            if improve > 0:
                best_measure = val["mrr"]
                if model_dir is not None:
                    save_checkpoint(
                        model_dir, {"params": params, "state": state,
                                    "opt_state": opt_state}, best_measure)
                if improve < cfg.patience:
                    patience_counter += 1
                else:
                    patience_counter = 0
            else:
                patience_counter += 1
            rec["best_mrr"] = round(best_measure, 6)

            if (cfg.patience_num > 0 and patience_counter >= cfg.patience_num
                    and epoch > cfg.min_epoch):
                logging.info("Early stopping with best val measure: %05.3f",
                             best_measure)
                record(rec)
                break
        record(rec)

    if cfg.ckpt_every > 0:
        wait_for_async_checkpoints()   # commit any in-flight periodic save
    return params, state, opt_state, best_measure
