"""Experiment configuration.

The reference drives everything through 28 argparse flags whose values are
dumped to ``experiments/<ds>/params.json`` and re-read as a dot-access object
(reference main.py:18-46, utils.py:10-38).  Here the single source of truth is
a frozen dataclass: every reference flag has a field with the same name and
default, plus TPU-native knobs (mesh shape, dtype, kernel selection) the
reference has no counterpart for.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class Config:
    # ---- experiment / driver (reference main.py:19-28) ----
    dataset: str = "WN18RR"
    seed: int = 19960326
    restore_dir: Optional[str] = None
    restore_torch: Optional[str] = None  # reference last.ckpt to import
                                         # (utils/torch_import.py)
    batch_size: int = 128
    max_epoch: int = 500
    min_epoch: int = 50
    eval_every: int = 1
    ckpt_every: int = 0              # >0: async periodic crash-insurance
                                     # checkpoint every K epochs (orbax; in
                                     # ADDITION to the reference's
                                     # save-on-improvement best checkpoint)
    patience: float = 0.001          # min improvement counted as progress
    patience_num: int = -1           # early-stop after this many stale evals (<=0: off)

    # ---- optimizer (reference main.py:29-31, 43, 217-219) ----
    learning_rate: float = 0.001
    weight_decay: float = 0.0
    lbl_smooth: float = 0.1
    clip_grad: float = 1.0
    lr_step_size: int = 10           # StepLR(step_size=10, gamma=0.995), main.py:219
    lr_gamma: float = 0.995
    lr_schedule: str = "step"        # step | cosine | constant (step =
                                     # reference parity; others are framework
                                     # extensions, train/optim.py epoch_lr)
    warmup_epochs: int = 0           # linear lr warmup over the first K epochs

    # ---- model: MGCN encoder (reference main.py:33-36) ----
    bias: bool = False
    gcn_in_dim: int = 100
    gcn_out_dim: int = 200
    gcn_drop: float = 0.3
    conv_drop: float = 0.1           # MGCNConv internal dropout (model.py:49,57)

    # ---- model: ConvE decoder (reference main.py:37-42) ----
    hidden_drop: float = 0.3
    feat_drop: float = 0.3
    k_w: int = 10
    k_h: int = 20
    num_filter: int = 200
    kernel_size: int = 7

    # ---- model family selection (framework extension; BASELINE.json configs) ----
    composition: str = "mult"        # mult | sub | corr — entity-relation
                                     # message composition (CompGCN family;
                                     # the reference is mult, model.py:111-118;
                                     # sub/corr require the XLA aggregation
                                     # path, i.e. use_pallas=False)
    model: str = "mgcn"              # mgcn | rgcn | rgat
    num_heads: int = 1               # rgat: attention heads (divides
                                     # gcn_out_dim)
    decoder: str = "conve"           # conve | distmult | transe | complex
                                     # | rotate
    num_layers: int = 1              # encoder depth (reference is fixed at 1)
    num_bases: int = 0               # >0: basis-decomposed relation weights (rgcn)
    num_blocks: int = 0              # >0: block-diagonal relation weights (rgcn)

    # ---- training mode (framework extension) ----
    train_mode: str = "one_vs_all"   # one_vs_all | negative_sampling
    num_negatives: int = 64          # negatives per positive in negative_sampling mode
    neg_loss: str = "bce"            # bce | margin | self_adversarial —
                                     # negative_sampling objective: BCE over
                                     # 1+K logits, hinge ranking, or the
                                     # RotatE self-adversarial weighting
                                     # (ops/losses.py)
    neg_margin: float = 1.0          # γ for margin / self_adversarial
    neg_adversarial_temp: float = 1.0  # α (softmax temperature over negatives)
    edge_sample_size: int = 0        # >0: per-step on-device edge subsampling

    # ---- TPU execution ----
    compute_dtype: str = "float32"   # float32 | bfloat16 (matmul inputs)
    moment_dtype: str = "float32"    # float32 | bfloat16 — Adam moment storage
                                     # (bf16 cuts the HBM-bound optimizer pass
                                     # from 28 to 20 B/param/step; update math
                                     # stays f32; affects numerics slightly)
    conv_impl: str = "im2col"        # im2col | patches | lax — ConvE conv lowering
                                     # (C_in=1 NCHW lax.conv has a pathological
                                     # TPU layout: its backward alone was the
                                     # single most expensive op of the step)
    use_pallas: bool = False         # fused Pallas SpMM for relational aggregation
    spmm_mode: str = "halves"        # halves | stacked | stacked_xla —
                                     # Pallas launch layout.
                                     # stacked_xla: ONE launch per pass for
                                     # both halves with XLA-precomposed
                                     # messages (launch merging without the
                                     # in-VMEM compose).
                                     # halves: per-direction kernels over XLA-
                                     # precomposed messages (fastest measured on
                                     # v5e single chip: the in-kernel compose's
                                     # extra DMA stream + rel matmuls cost more
                                     # than the XLA passes they replace).
                                     # stacked: ONE launch + one gather for both
                                     # directions with in-VMEM composition —
                                     # fewer, bigger ops; the layout meant for
                                     # edge-partitioned multi-chip execution.
    agg_schedule: str = "fused"      # fused | reference (bench-only naive schedule)
    ew_impl: str = "xla"             # xla | pallas — the SpMM compose
                                     # elementwise passes.  A/B'd 2026-08-18:
                                     # the one-pass multi-output Pallas
                                     # kernels measured 3% SLOWER end-to-end
                                     # (123.5 vs 119.6 steps/s) — the kernel
                                     # boundary forces its inputs (gather
                                     # outputs) to materialize, which XLA
                                     # avoids by fusing gathers into the
                                     # compose.  Kept as an option.
    bwd_perm: str = "contrib"        # contrib | operands | fwdw — backward
                                     # d_x segment-sum gets its cotangent
                                     # stream into src-sorted order: permute
                                     # the composed (E, d) contrib product
                                     # (one large dynamic gather), or compose
                                     # directly in src order from static
                                     # index arrays with only the parameter
                                     # table crossing the permutation
                                     # (ops/spmm_pallas.py _agg_bwd).  One
                                     # (E, d) permutation movement per half
                                     # per step is structurally irreducible;
                                     # the variants differ in scheduling.
    rel_compose: str = "gather"      # gather | onehot — how per-edge relation
                                     # rows are materialized in the pallas
                                     # aggregation path.  A/B'd 2026-08-18:
                                     # the hi/lo bf16 one-hot MXU matmul
                                     # measured 3% SLOWER end-to-end than the
                                     # row gather (105.9 vs 102.8 steps/s) —
                                     # XLA fuses the small-table gather better
                                     # than the trace suggested; kept as an
                                     # option for layout-hostile shapes
    loss_impl: str = "auto"          # auto | dense | sparse | fused —
                                     # one-vs-all BCE implementation.
                                     # dense: build the (B, N) label matrix on
                                     # device (reference semantics verbatim).
                                     # sparse: same loss via the affine label
                                     # split — no label matrix (ops/fused_loss).
                                     # fused: sparse + Pallas classifier; the
                                     # (B, N) score matrix never leaves VMEM
                                     # (opt-in: measured slightly slower at
                                     # B=128, wins when (B, N) stops fitting).
                                     # auto: sparse.
    prng_impl: str = "rbg"           # rbg | threefry | unsafe_rbg — dropout
                                     # key implementation.  threefry is pure
                                     # VPU math recomputed inside every fusion
                                     # that consumes a mask — traced as the
                                     # single biggest matmul-fusion cost, and
                                     # switching to the TPU hardware
                                     # RngBitGenerator measured +17% training
                                     # throughput (ab_variants.py 2026-08-18:
                                     # 123.7 vs 106.1 steps/s).  Same Bernoulli
                                     # distribution, different stream.
    remat: bool = False              # jax.checkpoint the full-graph encoder:
                                     # recompute its (N, d)/(E, d)
                                     # intermediates in the backward instead
                                     # of storing them.  MEASURED NEGATIVE
                                     # at the reference 1-layer config:
                                     # -22% steps/s AND higher peak HBM at
                                     # every scale (the backward's per-edge
                                     # workspace dominates either way;
                                     # scripts/remat_probe.py + BENCH_NOTES
                                     # round 3).  Prefer entity_sharded /
                                     # graph_axis or moment_dtype=bfloat16
                                     # to fit bigger graphs (at
                                     # num_layers=2 remat saved ~1% peak -
                                     # still net-negative)
    scan_epoch: bool = True          # run the whole epoch as one lax.scan
    eval_batch_size: int = 0         # 0: use batch_size
    data_axis: int = 1               # mesh: batch sharding
    graph_axis: int = 1              # mesh: edge partitioning
    entity_sharded: str = "none"     # none|gather|ring|boundary — shard the
                                     # ENTITY activations over the graph axis
                                     # too (the graph analog of context/
                                     # sequence parallelism, SURVEY.md §5.7):
                                     # per-direction aggregation runs under
                                     # shard_map with each device holding
                                     # 1/G of the entity rows; `gather`
                                     # assembles sources with one all_gather
                                     # + psum_scatter, `ring` ppermutes one
                                     # (N/G, d) shard around the ring with
                                     # compute/transfer overlap
                                     # (parallel/edge_parallel.py).  Requires
                                     # graph_axis > 1, model=mgcn,
                                     # composition=mult, use_pallas=False;
                                     # depth layers chain through the same
                                     # sharded schedules.  BatchNorm stays
                                     # exact: activations stay row-sharded
                                     # through BN and XLA inserts the
                                     # cross-shard moment reductions.
    partition: str = "contiguous"    # contiguous | locality — entity
                                     # numbering (data/partition.py): locality
                                     # renumbers entities with label-
                                     # propagation community ordering of the
                                     # train graph (BFS was tried and CANNOT
                                     # recover clusters through noise) so the
                                     # contiguous entity shards cluster and
                                     # the boundary exchange shrinks.
                                     # Isomorphic relabel
                                     # (names keep meaning); checkpoints must
                                     # restore under the same partition (the
                                     # CLI adopts it from params.json).

    # ---- bookkeeping ----
    do_train: bool = False
    do_test: bool = False
    experiments_dir: str = "experiments"
    data_dir: str = "data"
    compile_cache_dir: str = ""      # non-empty: persistent XLA compile cache
                                     # (jax_compilation_cache_dir) shared
                                     # across runs — remote TPU compiles cost
                                     # 1-5 min per program shape, so re-running
                                     # an experiment with the same shapes
                                     # skips straight to execution

    @property
    def label_key(self) -> str:
        return f"{self.dataset}-labels"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=4)

    @classmethod
    def from_json(cls, path: str) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


# Historical tuning from the reference's checked-in experiment snapshots
# (reference experiments/WN18RR/params.json, experiments/FB15k-237/params.json,
# experiments/Toy/params.json — stale files, but they record the tuned values;
# see SURVEY.md §2.4.1).
_PRESETS = {
    # WN18RR defaults to the fastest measured FULL-PRECISION profile
    # (pallas kernels, f32 — 27.6 Medges/s; bf16 compute is -10% at this
    # shape, BENCH_NOTES).  Override with --no_use_pallas.
    "WN18RR": dict(learning_rate=0.002, max_epoch=500, eval_every=2,
                   gcn_drop=0.2, feat_drop=0.2, hidden_drop=0.3,
                   use_pallas=True),
    # FB15k-237 defaults to the fastest measured profile (fb15k_best,
    # 31.7 Medges/s: Pallas kernels + bf16 matmul operands/messages with f32
    # accumulation + bf16 Adam-moment storage; generalization-gated in
    # tests/test_generalization.py).  bf16 compute is SCALE-DEPENDENT: +19%
    # at FB15k shape but -10% at WN18RR shape (BENCH_NOTES), so WN18RR stays
    # f32.  Override back with --no_use_pallas / --compute_dtype float32 /
    # --moment_dtype float32.
    "FB15k-237": dict(learning_rate=0.003, max_epoch=400, eval_every=2,
                      gcn_drop=0.2, feat_drop=0.2, hidden_drop=0.3,
                      use_pallas=True, compute_dtype="bfloat16",
                      moment_dtype="bfloat16"),
    "Toy": dict(seed=2020, batch_size=2, max_epoch=500, min_epoch=500,
                eval_every=1, patience=0.01, patience_num=10),
}


def dataset_preset(dataset: str, **overrides) -> Config:
    """Config with per-dataset tuned defaults, reference-compatible."""
    kw = dict(_PRESETS.get(dataset, {}))
    kw["dataset"] = dataset
    kw.update(overrides)
    return Config(**kw)
