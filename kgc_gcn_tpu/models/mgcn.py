"""M-GCN: relational message-passing encoder with per-edge embeddings + decoder.

Functional re-design of the reference model (reference model.py:10-127):

  * ``MGCN`` holds three xavier-initialized embedding tables — entities
    ``(N, d_in)``, relations ``(2R, d_in)``, and one learned embedding PER
    EDGE ``(2E, d_in)`` (model.py:16-18) — one relational conv layer, and a
    scoring decoder.
  * The conv layer composes ``x[src] * rel_emb * edge_emb``, projects with
    direction-typed weights (in/out/loop), aggregates with the reference's
    degree norm, averages the three direction results ``(drop(in) + drop(out)
    + loop) / 3``, applies BatchNorm then tanh, and projects relations with
    ``rels_weight`` dropping the appended loop relation (model.py:82-118).
  * TPU-native schedule: projection pulled out of the edge loop (see
    ops/scatter.py), self-loops as a dense op, norms precomputed in the graph,
    the whole forward one jit region.

``encode`` and ``decode`` are split so evaluation can encode the graph ONCE
and score every batch against the cached entity matrix — the reference
re-encodes the full graph for every eval batch (main.py:121, model.py:24-40),
which is pure waste since eval is deterministic.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kgc_gcn_tpu.config import Config
from kgc_gcn_tpu.data.graph import Graph
from kgc_gcn_tpu.models.common import (
    BNParams, BNState, batch_norm, bn_init, dropout, mm, xavier_uniform,
)
from kgc_gcn_tpu.models.decoders import DECODERS
from kgc_gcn_tpu.ops.scatter import aggregate_half, loop_messages


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MGCNConvParams:
    """Direction-typed relational conv weights (reference model.py:60-65)."""

    in_weight: jax.Array     # (d_in, d_out)
    out_weight: jax.Array    # (d_in, d_out)
    loop_weight: jax.Array   # (d_in, d_out)
    rels_weight: jax.Array   # (d_in, d_out)
    loop_rel: jax.Array      # (1, d_in)
    loop_edge: jax.Array     # (1, d_in)
    bn: BNParams
    bias: Optional[jax.Array]  # (d_out,) — reference never enables (model.py:20)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MGCNParams:
    entity_embedding: jax.Array     # (N, d_in)
    relation_embedding: jax.Array   # (2R, d_in)
    edge_embeddings: jax.Array      # (2, E_pad, d_in) — POSITIONAL layout:
    #   [0] is the in-half's edges in ITS dst-sorted order, [1] the
    #   out-half's.  Compute therefore reads the table as two contiguous
    #   slices (no (E, d) row gather fwd, no permutation in the gradient —
    #   both cost ~0.16-0.25 ms per half per step at WN18RR scale).
    #   Rows at positions >= e_real per half are padding: zero-norm edges give
    #   them zero gradient, so they stay at init forever and never contribute.
    #   The leading (2, E_pad) axes let the table shard along E_pad on the
    #   ``graph`` mesh axis so every edge's embedding row (and its Adam
    #   moments) lives on the same device as the edge — per-edge access stays
    #   local under edge partitioning (parallel/mesh.py shard_params).
    #   ``data.graph.edge_table_{to,from}_reference_order`` convert to/from the
    #   reference's edge-id numbering (reference model.py:18,
    #   data_loader.py:148) for import/export/parity.
    conv: MGCNConvParams
    decoder: Any
    # depth extension (framework-only; the reference is fixed at one layer):
    # CompGCN-style stacking — layer k>1 consumes layer k-1's entity AND
    # relation outputs (both d_out wide) with its own direction weights and
    # its own positional per-edge table (2*E_pad, d_out)
    extra_convs: Tuple[MGCNConvParams, ...] = ()
    extra_edge_embeddings: Tuple[jax.Array, ...] = ()


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MGCNState:
    conv_bn: BNState
    decoder: Any
    extra_bn: Tuple[BNState, ...] = ()


class MGCN:
    """Model family 'mgcn' — reference-parity encoder + pluggable decoder."""

    def __init__(self, cfg: Config, n_ent: int, n_rel: int, n_edge: int,
                 e_pad: Optional[int] = None, mesh=None):
        from kgc_gcn_tpu.data.graph import padded_edge_count
        self.cfg = cfg
        self.mesh = mesh   # required for the entity-sharded encoder schedules
        self.n_ent = n_ent
        self.n_rel = n_rel
        self.n_edge = n_edge
        # must match the Graph's per-half padded edge count (build_graph)
        self.e_pad = e_pad if e_pad is not None else padded_edge_count(n_edge)
        self.d_pad = -(-cfg.gcn_in_dim // 128) * 128
        self._dec_init, self._dec_apply = DECODERS[cfg.decoder]
        self.n_extra = max(1, cfg.num_layers) - 1
        if self.n_extra and cfg.edge_sample_size > 0:
            raise ValueError(
                "edge_sample_size is only supported with num_layers=1")
        if cfg.composition != "mult" and (
                cfg.use_pallas or cfg.edge_sample_size > 0
                or cfg.agg_schedule == "reference"):
            raise ValueError(
                f"composition={cfg.composition!r} requires the default XLA "
                "aggregation path (use_pallas=False, edge_sample_size=0, "
                "agg_schedule='fused'); the Pallas kernels and the reference "
                "bench schedule compose multiplicatively")
        if cfg.entity_sharded != "none":
            if mesh is None:
                raise ValueError(
                    "entity_sharded needs a (data, graph) mesh — build it "
                    "with parallel.mesh.make_mesh and pass mesh= (the CLI "
                    "does this from --graph_axis)")
            unsupported = [
                # gather: per-shard contiguous CSR; boundary: per-block CSR
                # precomputed by build_boundary_plan.  The ring's per-held-
                # shard blocks select dynamically inside a scan (still XLA)
                ("use_pallas", cfg.use_pallas
                 and cfg.entity_sharded not in ("gather", "boundary")),
                ("edge_sample_size", cfg.edge_sample_size > 0),
                ("composition", cfg.composition != "mult"),
                ("agg_schedule", cfg.agg_schedule != "fused"),
            ]
            bad = [k for k, v in unsupported if v]
            if bad:
                raise ValueError(
                    f"entity_sharded={cfg.entity_sharded!r} supports the "
                    "mult composition only (and use_pallas only with the "
                    f"gather schedule); incompatible flags: {bad}")
        if cfg.spmm_mode == "stacked_xla" and cfg.compute_dtype == "bfloat16":
            import logging
            logging.warning(
                "spmm_mode=stacked_xla with compute_dtype=bfloat16 measured "
                "-23%% vs spmm_mode=halves at FB15k scale: the merged "
                "backward's permutation gathers unfuse into bf16 layout "
                "copies (BENCH_NOTES round 3). Use spmm_mode=halves with "
                "bfloat16.")
        if (cfg.use_pallas and cfg.spmm_mode != "halves"
                and (cfg.bwd_perm != "contrib" or cfg.ew_impl != "xla")):
            import logging
            logging.warning(
                "spmm_mode=%s uses the contrib backward and XLA elementwise "
                "paths; non-default bwd_perm/ew_impl are IGNORED (A/B those "
                "flags with spmm_mode=halves)", cfg.spmm_mode)
        if (cfg.use_pallas and cfg.spmm_mode != "halves" and mesh is not None
                and mesh.shape.get("graph", 1) > 1):
            raise ValueError(
                f"spmm_mode={cfg.spmm_mode!r} cannot ride an edge partition — GSPMD "
                "reshards the one fused custom call's inputs to replicated, "
                "so every device would process the full edge list; use "
                "spmm_mode='halves' (the per-shard shard_map kernels) with "
                "graph_axis > 1")
        self._es = None              # built by prepare_entity_sharding
                                     # (parallel/entity_sharding.py — the
                                     # schedule plumbing shared with RGCN)
        self._edge_pallas_agg = None  # built by prepare_edge_sharding
        self._edge_csr = None

    @property
    def boundary_stats(self):
        """Comm-volume accounting per half (boundary schedule only)."""
        return self._es.boundary_stats if self._es is not None else None

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> Tuple[MGCNParams, MGCNState]:
        cfg = self.cfg
        keys = jax.random.split(key, 10 + 7 * self.n_extra)
        bn_p, bn_s = bn_init(cfg.gcn_out_dim)
        conv = MGCNConvParams(
            in_weight=xavier_uniform(keys[0], (cfg.gcn_in_dim, cfg.gcn_out_dim)),
            out_weight=xavier_uniform(keys[1], (cfg.gcn_in_dim, cfg.gcn_out_dim)),
            loop_weight=xavier_uniform(keys[2], (cfg.gcn_in_dim, cfg.gcn_out_dim)),
            rels_weight=xavier_uniform(keys[3], (cfg.gcn_in_dim, cfg.gcn_out_dim)),
            loop_rel=xavier_uniform(keys[4], (1, cfg.gcn_in_dim)),
            loop_edge=xavier_uniform(keys[5], (1, cfg.gcn_in_dim)),
            bn=bn_p,
            bias=None,
        )
        dec_p, dec_s = self._dec_init(keys[6], cfg, self.n_ent)
        params = MGCNParams(
            entity_embedding=xavier_uniform(
                keys[7], (self.n_ent, cfg.gcn_in_dim)),
            relation_embedding=xavier_uniform(
                keys[8], (2 * self.n_rel, cfg.gcn_in_dim)),
            # xavier bound computed from the REFERENCE shape (2E, d_in) so the
            # real rows' distribution matches reference utils.py:113-118
            # exactly; padding rows never train (zero-norm edges, zero grad)
            edge_embeddings=jax.random.uniform(
                keys[9], (2, self.e_pad, cfg.gcn_in_dim), jnp.float32,
                minval=-(b := float(
                    (6.0 / (2 * self.n_edge + cfg.gcn_in_dim)) ** 0.5)),
                maxval=b),
            conv=conv,
            decoder=dec_p,
            extra_convs=(), extra_edge_embeddings=(),
        )
        extra_convs, extra_tabs, extra_bns = [], [], []
        for i in range(self.n_extra):
            k = keys[10 + 7 * i: 10 + 7 * (i + 1)]
            d = cfg.gcn_out_dim
            bnp_k, bns_k = bn_init(d)
            extra_convs.append(MGCNConvParams(
                in_weight=xavier_uniform(k[0], (d, d)),
                out_weight=xavier_uniform(k[1], (d, d)),
                loop_weight=xavier_uniform(k[2], (d, d)),
                rels_weight=xavier_uniform(k[3], (d, d)),
                loop_rel=xavier_uniform(k[4], (1, d)),
                loop_edge=xavier_uniform(k[5], (1, d)),
                bn=bnp_k, bias=None))
            b = float((6.0 / (2 * self.n_edge + d)) ** 0.5)
            extra_tabs.append(jax.random.uniform(
                k[6], (2, self.e_pad, d), jnp.float32, minval=-b, maxval=b))
            extra_bns.append(bns_k)
        if self.n_extra:
            params = dataclasses.replace(
                params, extra_convs=tuple(extra_convs),
                extra_edge_embeddings=tuple(extra_tabs))
        return params, MGCNState(conv_bn=bn_s, decoder=dec_s,
                                 extra_bn=tuple(extra_bns))

    # ---------------------------------------------------------------- encode

    def encode(
        self,
        params: MGCNParams,
        state: MGCNState,
        graph: Graph,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array, Tuple[BNState, Tuple[BNState, ...]]]:
        """Full-graph encoder → (all_ent (N, d_out), all_rel (2R, d_out),
        enc_aux = (layer-1 BNState, tuple of extra-layer BNStates))."""
        cfg = self.cfg
        rngs = rngs or {}
        c = params.conv

        x = params.entity_embedding
        rel_all = jnp.concatenate([params.relation_embedding, c.loop_rel], axis=0)
        # per-half contiguous slices of the positionally-stored table
        d_in = cfg.gcn_in_dim
        et_in = params.edge_embeddings[0]
        et_out = params.edge_embeddings[1]

        if train and cfg.edge_sample_size > 0 and "sample_in" in rngs:
            # stochastic subgraph training: sample K edges per half on device
            from kgc_gcn_tpu.ops.sampler import (
                aggregate_sampled_half, sample_half)
            k = cfg.edge_sample_size
            h_in = sample_half(rngs["sample_in"], graph.inb, k, self.n_edge)
            h_out = sample_half(rngs["sample_out"], graph.outb, k, self.n_edge)
            in_agg = aggregate_sampled_half(
                x, rel_all, et_in, h_in, self.n_ent)
            out_agg = aggregate_sampled_half(
                x, rel_all, et_out, h_out, self.n_ent)
            in_res = in_agg @ c.in_weight
            out_res = out_agg @ c.out_weight
        elif cfg.use_pallas and cfg.spmm_mode == "stacked_xla":
            # one launch for both halves, XLA-precomposed messages (the
            # d_rel/d_etab gradients split per half exactly as the per-half
            # path; see ops/spmm_pallas.aggregate_stacked_xla)
            from kgc_gcn_tpu.ops.spmm_pallas import aggregate_stacked_xla
            in_agg, out_agg = aggregate_stacked_xla(
                x, rel_all,
                params.edge_embeddings.reshape(2 * self.e_pad, d_in),
                graph.stacked, self.n_ent,
                jax.default_backend() != "tpu",
                msg_dtype=cfg.compute_dtype,
                rel_onehot=cfg.rel_compose != "gather")
            in_res = mm(in_agg, c.in_weight, cfg.compute_dtype)
            out_res = mm(out_agg, c.out_weight, cfg.compute_dtype)
        elif cfg.use_pallas and cfg.spmm_mode == "stacked":
            # fused both-halves kernel over the stacked view: one gather, one
            # launch; aggregates come back 128-wide with zero pad columns, so
            # project with row-padded weights (identical result, no re-slice)
            from kgc_gcn_tpu.ops.spmm_pallas import aggregate_stacked_pallas
            interp = jax.default_backend() != "tpu"
            in_agg, out_agg = aggregate_stacked_pallas(
                x, rel_all,
                params.edge_embeddings.reshape(2 * self.e_pad, d_in),
                graph.stacked, self.n_ent, interp)
            wpad = ((0, self.d_pad - d_in), (0, 0))
            in_res = mm(in_agg, jnp.pad(c.in_weight, wpad), cfg.compute_dtype)
            out_res = mm(out_agg, jnp.pad(c.out_weight, wpad),
                         cfg.compute_dtype)
        elif cfg.entity_sharded != "none":
            in_agg, out_agg = self._agg_entity_sharded(
                x, rel_all, params.edge_embeddings, graph)
            in_res = mm(in_agg, c.in_weight, cfg.compute_dtype)
            out_res = mm(out_agg, c.out_weight, cfg.compute_dtype)
        elif cfg.agg_schedule == "reference":
            from kgc_gcn_tpu.ops.scatter import aggregate_half_reference_schedule
            in_res = aggregate_half_reference_schedule(
                x, rel_all, et_in, graph.inb, c.in_weight, self.n_ent)
            out_res = aggregate_half_reference_schedule(
                x, rel_all, et_out, graph.outb, c.out_weight, self.n_ent)
        else:
            # pallas or plain XLA per-half dispatch (shared with depth layers)
            in_agg, out_agg = self._agg_halves(
                x, rel_all, params.edge_embeddings, graph)
            in_res = mm(in_agg, c.in_weight, cfg.compute_dtype)
            out_res = mm(out_agg, c.out_weight, cfg.compute_dtype)
        loop_res = mm(loop_messages(x, c.loop_rel, c.loop_edge,
                                    cfg.composition),
                      c.loop_weight, cfg.compute_dtype)

        # (drop(in) + drop(out) + loop) / 3 — loop messages are NOT dropped
        # (reference model.py:103)
        out = (dropout(in_res, cfg.conv_drop, rngs.get("conv_in"), train)
               + dropout(out_res, cfg.conv_drop, rngs.get("conv_out"), train)
               + loop_res) / 3.0
        if c.bias is not None:
            out = out + c.bias
        out, bn_state = batch_norm(out, c.bn, state.conv_bn, train=train)
        all_ent = jnp.tanh(out)

        # relation projection, dropping the appended loop relation
        # (reference model.py:107)
        all_rel = mm(rel_all, c.rels_weight, cfg.compute_dtype)[:-1]

        # depth extension: CompGCN-style stacked layers over the same graph —
        # layer k consumes layer k-1's entity AND relation outputs, with its
        # own per-edge table; inter-layer entity dropout uses gcn_drop
        extra_bns = []
        for i, (ck, et_k) in enumerate(zip(params.extra_convs,
                                           params.extra_edge_embeddings)):
            x_k = dropout(all_ent, cfg.gcn_drop, rngs.get(f"layer{i}"), train)
            rel_k = jnp.concatenate([all_rel, ck.loop_rel], axis=0)
            if cfg.entity_sharded != "none":
                # the depth layers chain through the same row-sharded
                # schedules (same graph -> same ring blocks; the layer's own
                # (2, E_pad, d_out) table shards along E_pad like layer 1's)
                in_agg, out_agg = self._agg_entity_sharded(
                    x_k, rel_k, et_k, graph)
            else:
                in_agg, out_agg = self._agg_halves(x_k, rel_k, et_k, graph)
            in_res = mm(in_agg, ck.in_weight, cfg.compute_dtype)
            out_res = mm(out_agg, ck.out_weight, cfg.compute_dtype)
            loop_res = mm(loop_messages(x_k, ck.loop_rel, ck.loop_edge,
                                        cfg.composition),
                          ck.loop_weight, cfg.compute_dtype)
            h = (dropout(in_res, cfg.conv_drop, rngs.get(f"conv_in{i}"), train)
                 + dropout(out_res, cfg.conv_drop,
                           rngs.get(f"conv_out{i}"), train)
                 + loop_res) / 3.0
            if ck.bias is not None:
                h = h + ck.bias
            h, bn_k = batch_norm(h, ck.bn, state.extra_bn[i], train=train)
            all_ent = jnp.tanh(h)
            all_rel = mm(rel_k, ck.rels_weight, cfg.compute_dtype)[:-1]
            extra_bns.append(bn_k)

        # post-encoder entity dropout (reference model.py:34) — applied before
        # BOTH the src gather and the all-entity scoring matmul
        all_ent = dropout(all_ent, cfg.gcn_drop, rngs.get("gcn"), train)
        return all_ent, all_rel, (bn_state, tuple(extra_bns))

    # -------------------------------------------- entity-sharded aggregation

    def _mesh_interpret(self) -> bool:
        """Pallas interpret mode follows the MESH devices' platform (a CPU
        mesh can coexist with a TPU default backend — the driver's dryrun)."""
        return next(iter(self.mesh.devices.flat)).platform != "tpu"

    def _put_csr(self, csr):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kgc_gcn_tpu.parallel.distributed import put_global
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        row = NamedSharding(self.mesh, P(GRAPH_AXIS))
        return tuple(put_global(a, row) for a in csr)

    def prepare_entity_sharding(self, graph: Graph) -> None:
        """Host-side setup for ``cfg.entity_sharded`` (must run OUTSIDE jit:
        schedule metadata is computed on the host from the static edge
        structure).  Idempotent; the Trainer calls it.  The plumbing lives in
        parallel/entity_sharding.py (shared with RGCN); compose=None selects
        the multiplicative MGCN form + the kernel sub-paths."""
        cfg = self.cfg
        if cfg.entity_sharded == "none" or self._es is not None:
            return
        from kgc_gcn_tpu.parallel.entity_sharding import (
            EntityShardedAggregator)
        self._es = EntityShardedAggregator(
            cfg, self.mesh, self.n_ent, compose=None,
            interpret=self._mesh_interpret())
        self._es.prepare(graph)

    def prepare_edge_sharding(self, graph: Graph) -> None:
        """Host-side setup for Pallas kernels UNDER the edge partition.

        GSPMD cannot partition a Pallas custom call — with ``use_pallas`` on
        a graph axis it would reshard the kernel inputs to replicated and run
        every edge on every device.  This precomputes per-shard local CSR
        metadata (parallel/edge_parallel.py build_local_csr) so _agg_halves
        can dispatch the shard_map per-shard kernel schedule instead.
        Idempotent; the Trainer calls it when a mesh with graph_axis > 1 is
        active."""
        cfg = self.cfg
        if (not cfg.use_pallas or self.mesh is None
                or self._edge_pallas_agg is not None):
            return
        import logging
        ignored = [k for k, v, dflt in (
            ("bwd_perm", cfg.bwd_perm, "contrib"),
            ("rel_compose", cfg.rel_compose, "gather"),
            ("ew_impl", cfg.ew_impl, "xla")) if v != dflt]
        if ignored:
            logging.warning(
                "the per-shard edge-partition kernel schedule uses the "
                "default contrib/gather/xla paths; non-default %s are "
                "IGNORED under graph_axis > 1 (A/B those flags single-chip)",
                ignored)
        from kgc_gcn_tpu.parallel.edge_parallel import (
            build_local_csr, make_pallas_sharded_aggregate)
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        g = self.mesh.shape[GRAPH_AXIS]
        if g < 2:
            return
        self._edge_csr = {
            name: self._put_csr(build_local_csr(getattr(graph, name), g))
            for name in ("inb", "outb")}
        self._edge_pallas_agg = make_pallas_sharded_aggregate(
            self.mesh, self.n_ent, self._mesh_interpret(),
            cfg.compute_dtype)

    def _agg_entity_sharded(self, x, rel_all, et_full, graph: Graph):
        """Per-half aggregation with the ENTITY activations row-sharded over
        the graph axis (the graph analog of context parallelism, SURVEY.md
        §5.7): x is padded to the axis-divisible row count, constrained to
        ``P(graph)`` row sharding, aggregated under shard_map (all_gather +
        psum_scatter, the ppermute ring, or the boundary exchange), and
        sliced back — downstream combine/BN/tanh stay row-sharded with XLA
        inserting the cross-shard BN moment reductions (the §7 'hard part').
        Plumbing: parallel/entity_sharding.py (shared with RGCN)."""
        if self._es is None:
            raise RuntimeError(
                "call prepare_entity_sharding(graph) before encode "
                "(the Trainer does this automatically)")
        return self._es.agg_pair(x, rel_all, et_full, graph)

    def _agg_halves(self, x, rel_all, et_full, graph: Graph):
        """Per-half relational aggregation of a full (2, E_pad, d) edge table
        (used by the stacked depth layers; layer 1 has its own dispatch)."""
        cfg = self.cfg
        et_in, et_out = et_full[0], et_full[1]
        if self._edge_pallas_agg is not None:
            # mesh with a graph axis: per-shard Pallas kernels under
            # shard_map (prepare_edge_sharding) — the GSPMD fallback would
            # replicate the custom call's inputs
            return (self._edge_pallas_agg(x, rel_all, et_in, graph.inb,
                                          self._edge_csr["inb"]),
                    self._edge_pallas_agg(x, rel_all, et_out, graph.outb,
                                          self._edge_csr["outb"]))
        if cfg.use_pallas:
            from kgc_gcn_tpu.ops.spmm_pallas import aggregate_half_pallas
            interp = jax.default_backend() != "tpu"
            onehot = cfg.rel_compose != "gather"
            ew = cfg.ew_impl == "pallas"
            bp = cfg.bwd_perm
            return (aggregate_half_pallas(x, rel_all, et_in, graph.inb,
                                          self.n_ent, interp,
                                          msg_dtype=cfg.compute_dtype,
                                          rel_onehot=onehot, ew_pallas=ew,
                                          bwd_perm=bp),
                    aggregate_half_pallas(x, rel_all, et_out, graph.outb,
                                          self.n_ent, interp,
                                          msg_dtype=cfg.compute_dtype,
                                          rel_onehot=onehot, ew_pallas=ew,
                                          bwd_perm=bp))
        return (aggregate_half(x, rel_all, et_in, graph.inb, self.n_ent,
                               cfg.composition),
                aggregate_half(x, rel_all, et_out, graph.outb, self.n_ent,
                               cfg.composition))

    # ---------------------------------------------------------------- decode

    def decode(
        self,
        params: MGCNParams,
        state: MGCNState,
        all_ent: jax.Array,
        all_rel: jax.Array,
        src: jax.Array,
        rel: jax.Array,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, Any]:
        src_emb = all_ent[src]
        rel_emb = all_rel[rel]
        return self._dec_apply(
            params.decoder, state.decoder, self.cfg, src_emb, rel_emb, all_ent,
            train=train, rngs=rngs)

    def query_and_bias(
        self,
        params: MGCNParams,
        state: MGCNState,
        all_ent: jax.Array,
        all_rel: jax.Array,
        src: jax.Array,
        rel: jax.Array,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array, Any]:
        """Decoder trunk only: (h (B, d_out), ent_bias (N,), dec_state) with
        logits == h @ all_ent.T + ent_bias — for the fused scoring+BCE loss
        (ops/fused_loss.py), which never materializes the (B, N) logits."""
        from kgc_gcn_tpu.models.decoders import QUERY_TRUNKS
        trunk = QUERY_TRUNKS[self.cfg.decoder]
        h, dec_state = trunk(
            params.decoder, state.decoder, self.cfg, all_ent[src],
            all_rel[rel], train=train, rngs=rngs)
        return h, params.decoder.ent_bias, dec_state

    def score_candidates(
        self,
        params: MGCNParams,
        state: MGCNState,
        all_ent: jax.Array,
        all_rel: jax.Array,
        src: jax.Array,       # (B,)
        rel: jax.Array,       # (B,)
        cand: jax.Array,      # (B, K) candidate entity ids
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, Any]:
        """Score K sampled candidates per query (negative-sampling mode)."""
        from kgc_gcn_tpu.models.decoders import CANDIDATE_SCORERS
        scorer = CANDIDATE_SCORERS[self.cfg.decoder]
        return scorer(
            params.decoder, state.decoder, self.cfg,
            all_ent[src], all_rel[rel], all_ent[cand], cand,
            train=train, rngs=rngs)

    def make_rngs(self, rng: jax.Array) -> Dict[str, jax.Array]:
        """Named dropout/sampling keys for one training step.

        The single source of the key names — every trainer must use this (a
        hand-rolled name list that misses one silently DISABLES that dropout
        site, since ``dropout(key=None)`` is the identity)."""
        names = ["conv_in", "conv_out", "gcn", "feat", "hidden",
                 "sample_in", "sample_out"]
        for i in range(self.n_extra):
            names += [f"layer{i}", f"conv_in{i}", f"conv_out{i}"]
        return dict(zip(names, jax.random.split(rng, len(names))))

    def rebuild_state(self, state: MGCNState, enc_aux, dec_state) -> MGCNState:
        """Reassemble model state from encode's aux (bn stats) + decoder state."""
        if enc_aux is None:
            return MGCNState(conv_bn=state.conv_bn, decoder=dec_state,
                             extra_bn=state.extra_bn)
        bn, extra = enc_aux
        return MGCNState(conv_bn=bn, decoder=dec_state, extra_bn=extra)

    # ----------------------------------------------------------------- apply

    def apply(
        self,
        params: MGCNParams,
        state: MGCNState,
        graph: Graph,
        src: jax.Array,
        rel: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, MGCNState]:
        """Full forward: (B,) src/rel query → (B, N) logits over all entities."""
        rngs = self.make_rngs(rng) if rng is not None else {}
        all_ent, all_rel, enc_aux = self.encode(
            params, state, graph, train=train, rngs=rngs)
        logits, dec_state = self.decode(
            params, state, all_ent, all_rel, src, rel, train=train, rngs=rngs)
        return logits, self.rebuild_state(state, enc_aux, dec_state)
