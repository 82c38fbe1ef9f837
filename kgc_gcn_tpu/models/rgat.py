"""Relational graph-attention family (RGAT): GAT-style neighbor attention
with relation-typed messages, on the same Graph container as MGCN/RGCN.

The reference repo has no attention model — this is a framework family
(like RGCN, models/rgcn.py) chosen for its TPU fit:

  * ONE ``(N, d_in) x (d_in, d_out)`` MXU projection per layer (no per-edge
    weights); per-edge messages compose in ``d_out`` on the VPU as
    ``h[src] * rel_mult[rel]`` — the same multiplicative relation typing as
    MGCN/CompGCN (reference model.py:111-118 analog).
  * Attention is additive GAT: ``s_e = leakyrelu(<z_e, a_src> + <h[dst],
    a_dst> + b_rel[rel])`` per head, normalized with a SEGMENT SOFTMAX over
    each destination's incoming edges.  The halves are dst-sorted CSR
    (data/graph.py), so ``segment_max`` / ``segment_sum`` run with
    ``indices_are_sorted=True`` — fused VPU reductions, no sorting, no
    dynamic shapes.
  * Padding edges (norm == 0, data/graph.py) are masked with ``-inf`` logits
    BEFORE the softmax: a zero-norm trick like MGCN's would not work here
    because softmax renormalizes.

Multi-head (``cfg.num_heads``): d_out splits into (H, d_out/H); attention
logits are per (edge, head); the weighted segment-sum returns (N, H, dh)
re-flattened to (N, d_out).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from kgc_gcn_tpu.config import Config
from kgc_gcn_tpu.data.graph import Graph, GraphHalf
from kgc_gcn_tpu.models.common import dropout, xavier_uniform
from kgc_gcn_tpu.models.decoders import DECODERS
from kgc_gcn_tpu.models.family_base import DecoderFamilyMixin

import os

RGAT_LAYOUT = os.environ.get("KGC_RGAT_LAYOUT", "flat")
#   edge-message layout of the attention path (round-4 closing-trace idea,
#   A/B'd round 5: flat 50.7 vs 3d 45.0/45.2 steps/s at WN18RR scale,
#   +12.5%, loss identical — flat is the DEFAULT; see BENCH_NOTES):
#   '3d'   — (E, H, dh) reshapes for the logits einsum and the alpha-weighted
#            message (the original layout; XLA emits ~1.6 ms/step of retiling
#            copies for the 3D views + 1.5 ms combine copies at WN18RR scale)
#   'flat' — keep (E, d_out) 2D everywhere: logits via a block-diagonal
#            (d_out, H) matmul (att_src scattered on the block diagonal),
#            alpha expansion via a 0/1 (H, d_out) block-indicator matmul —
#            both tiny MXU ops instead of VPU-retiling reshapes


def _block_mats(att_src: jax.Array, dtype=jnp.float32):
    """(d_out, H) block-diagonal logits matrix A (A[d, h] = att_src[h, d']
    for d in head h's lane block) and the (H, d_out) 0/1 block indicator."""
    nh, dh = att_src.shape
    d_out = nh * dh
    ind = (jnp.arange(d_out, dtype=jnp.int32)[None, :] // dh
           == jnp.arange(nh, dtype=jnp.int32)[:, None]).astype(dtype)
    a_mat = att_src.reshape(-1)[:, None] * ind.T        # (d_out, H)
    return a_mat, ind


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RGATLayerParams:
    weight: jax.Array      # (d_in, d_out) shared projection
    rel_mult: jax.Array    # (2R, d_out) relation message typing
    att_src: jax.Array     # (H, d_out/H) source/message attention vector
    att_dst: jax.Array     # (H, d_out/H) destination attention vector
    rel_bias: jax.Array    # (2R, H) per-relation attention bias
    self_weight: jax.Array  # (d_in, d_out) self-connection


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RGATParams:
    entity_embedding: jax.Array    # (N, d_in)
    relation_embedding: jax.Array  # (2R, d_out) decoder relation vectors
    layers: List[RGATLayerParams]
    decoder: Any


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RGATState:
    decoder: Any


def segment_softmax(
    logits: jax.Array,     # (E, H) — -inf on masked (padding) edges
    seg: jax.Array,        # (E,) destination ids, non-decreasing
    n_seg: int,
    indptr: jax.Array = None,   # CSR pointers of seg — enables the kernel path
    use_pallas: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Numerically-stable per-segment softmax; masked edges get weight 0 and
    empty segments produce zeros (not NaN).

    The max subtraction is shift-invariant, so its gradient is exactly zero
    — ``stop_gradient`` removes the backward scatter XLA would otherwise
    emit for it.  With ``use_pallas`` the denominator segment-sum and the
    per-edge gathers' backward scatters run through the MXU CSR kernel
    (ops/spmm_pallas.py round-3 wrappers) instead of XLA's serial scatters.
    """
    from kgc_gcn_tpu.ops import spmm_pallas as _sp
    if use_pallas and indptr is not None and _sp.ATTN_MAX == "pallas":
        # tiled CSR max kernel (VPU masked lane-reduction — the one-hot MXU
        # trick doesn't apply to max); XLA's scatter-max lowering costs
        # ~1.2 ms per half at WN18RR scale (BENCH_NOTES round 3).
        # stop_gradient goes on the INPUT: a zero tangent makes autodiff
        # skip the kernel's (unimplemented) JVP entirely
        smax = _sp.segment_max_sorted(
            jax.lax.stop_gradient(logits), seg, indptr, n_seg, interpret)
    else:
        smax = jax.lax.stop_gradient(
            jax.ops.segment_max(logits, seg, num_segments=n_seg,
                                indices_are_sorted=True))    # (S, H)
    smax_e = jnp.where(jnp.isfinite(smax), smax, 0.0)[seg]   # (E, H)
    expd = jnp.where(jnp.isfinite(logits),
                     jnp.exp(logits - smax_e), 0.0)
    if use_pallas and indptr is not None:
        from kgc_gcn_tpu.ops.spmm_pallas import (
            gather_rows_sorted, segment_sum_sorted)
        denom = segment_sum_sorted(expd, seg, indptr, n_seg, interpret)
        denom_e = gather_rows_sorted(jnp.maximum(denom, 1e-9), seg, indptr,
                                     n_seg, interpret)
        return expd / denom_e
    denom = jax.ops.segment_sum(expd, seg, num_segments=n_seg,
                                indices_are_sorted=True)     # (S, H)
    return expd / jnp.maximum(denom[seg], 1e-9)


def _attend_half(
    h: jax.Array,              # (N, d_out) projected entities
    layer: RGATLayerParams,
    half: GraphHalf,
    n_ent: int,
    neg_slope: float = 0.2,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One direction's attention aggregation: (N, d_out)."""
    nh, dh = layer.att_src.shape
    if use_pallas:
        # the edge message z is SHARED by the logits einsum and the weighted
        # aggregation: one gather+mul forward and ONE kernel-backed backward
        # for both paths' d_h/d_rel_mult cotangents (the split version left
        # the logits path on a 4.8 ms/step XLA scatter pair — round-4 trace)
        from kgc_gcn_tpu.ops.spmm_pallas import (
            edge_compose, gather_rows_few, gather_rows_sorted,
            segment_sum_sorted)
        z = edge_compose(h, layer.rel_mult, half.src, half.rel, half.sperm,
                         half.s_indptr, half.s_src,
                         (half.rperm, half.r_indptr, half.r_rel),
                         n_ent, interpret)
    else:
        z = h[half.src] * layer.rel_mult[half.rel]           # (E, d_out)
    flat = RGAT_LAYOUT == "flat"
    if flat:
        # H-blocked flat-lane layout: the per-head contractions become tiny
        # block-structured MXU matmuls and z/msg stay (E, d_out) 2D — no
        # (E, H, dh) retiling copies (see RGAT_LAYOUT above)
        a_src_mat, ind = _block_mats(layer.att_src)
        a_dst_mat, _ = _block_mats(layer.att_dst)
        zh = None
        score_dst = jnp.dot(h, a_dst_mat,
                            preferred_element_type=jnp.float32)  # (N, H)
    else:
        zh = z.reshape(-1, nh, dh)                           # (E, H, dh)
        # the destination term is a per-NODE reduction — precompute it (N, H)
        # and gather H floats per edge instead of gathering the full
        # (E, d_out) h[dst] rows (d_out/H x less HBM traffic on the hot
        # path; large permutation gathers run well under peak in context,
        # BENCH_NOTES)
        score_dst = jnp.einsum("nhd,hd->nh", h.reshape(n_ent, nh, dh),
                               layer.att_dst,
                               preferred_element_type=jnp.float32)  # (N, H)
    if use_pallas:
        # per-edge gathers whose BACKWARD scatters route through the MXU
        # CSR kernel / one-hot matmul instead of XLA's serial scatter-add
        sd_e = gather_rows_sorted(score_dst, half.dst, half.indptr, n_ent,
                                  interpret)
        rb_e = gather_rows_few(
            layer.rel_bias, half.rel, int(half.r_indptr.shape[0]) - 1,
            (half.rperm, half.r_indptr, half.r_rel), interpret)
    else:
        sd_e = score_dst[half.dst]
        rb_e = layer.rel_bias[half.rel]
    if flat:
        s = jnp.dot(z, a_src_mat,
                    preferred_element_type=jnp.float32) + sd_e + rb_e
    else:
        s = (jnp.einsum("ehd,hd->eh", zh, layer.att_src,
                        preferred_element_type=jnp.float32)
             + sd_e + rb_e)                                  # (E, H)
    s = jax.nn.leaky_relu(s, neg_slope)
    # padding edges (norm == 0) must not participate in the softmax
    s = jnp.where(half.norm[:, None] > 0, s, -jnp.inf)
    alpha = segment_softmax(s, half.dst, n_ent, indptr=half.indptr,
                            use_pallas=use_pallas, interpret=interpret)
    if flat:
        msg = z * jnp.dot(alpha, ind,
                          preferred_element_type=jnp.float32)
    else:
        msg = (zh * alpha[:, :, None]).reshape(-1, nh * dh)
    if use_pallas:
        # MXU CSR kernel via the generic sorted wrapper: its backward is a
        # plain gather, the products autodiff elementwise, and d_z flows
        # into edge_compose's kernel-backed backward
        return segment_sum_sorted(msg, half.dst, half.indptr, n_ent,
                                  interpret)
    out = jax.ops.segment_sum(msg, half.dst,
                              num_segments=n_ent, indices_are_sorted=True)
    return out


def _make_sharded_attend(mesh, n_ent: int, nh: int, interpret: bool):
    """shard_map'd per-shard attention body for one direction half.

    Each device runs the single-chip kernel schedule on its local edge slice
    (local CSR from build_local_csr); the three segment reductions combine
    across shards with pmax/psum — boundary-straddling dst rows are exactly
    the rows where more than one shard contributes non-identity values.
    Gradients: the collectives' transposes (psum^T = identity broadcast) and
    the kernels' custom VJPs; cotangents of the replicated operands (h,
    rel_mult, att vectors) psum automatically through the shard_map
    transpose."""
    import functools

    from jax.sharding import PartitionSpec as P

    from kgc_gcn_tpu.ops.spmm_pallas import (
        edge_compose, gather_rows_few, gather_rows_sorted,
        segment_max_sorted, segment_sum_sorted)
    from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS

    edge = P(GRAPH_AXIS)
    rep = P()
    shardwise = P(GRAPH_AXIS)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep,
                  edge, edge, edge, edge,
                  shardwise, shardwise, shardwise, shardwise,
                  shardwise, shardwise, shardwise),
        out_specs=rep,
        check_vma=False,   # pallas out_shape carries no vma annotation
    )
    def _attend(h, score_dst, rel_mult, att_src, rel_bias,
                src, dst, rel, norm,
                indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr):
        indptr, sperm, s_src, s_indptr = (indptr[0], sperm[0], s_src[0],
                                          s_indptr[0])
        rdata = (rperm[0], r_indptr[0], r_rel[0])
        n_rel_rows = int(r_indptr.shape[1]) - 1
        dh = h.shape[1] // nh
        # shared edge message with the kernel-backed combined backward
        # (see edge_compose) — per-shard d_h/d_rel partials psum through
        # the shard_map transpose
        z = edge_compose(h, rel_mult, src, rel, sperm, s_indptr, s_src,
                         rdata, n_ent, interpret)
        flat = RGAT_LAYOUT == "flat"
        if flat:
            a_src_mat, ind = _block_mats(att_src)
            zh = None
        else:
            zh = z.reshape(-1, nh, dh)
        sd_e = gather_rows_sorted(score_dst, dst, indptr, n_ent, interpret)
        rb_e = gather_rows_few(rel_bias, rel, n_rel_rows, rdata, interpret)
        if flat:
            s = jnp.dot(z, a_src_mat,
                        preferred_element_type=jnp.float32) + sd_e + rb_e
        else:
            s = (jnp.einsum("ehd,hd->eh", zh, att_src,
                            preferred_element_type=jnp.float32)
                 + sd_e + rb_e)
        s = jax.nn.leaky_relu(s, 0.2)
        s = jnp.where(norm[:, None] > 0, s, -jnp.inf)
        smax = segment_max_sorted(jax.lax.stop_gradient(s), dst, indptr,
                                  n_ent, interpret)
        smax = jax.lax.pmax(smax, GRAPH_AXIS)              # cross-shard rows
        smax_e = jnp.where(jnp.isfinite(smax), smax, 0.0)[dst]
        expd = jnp.where(jnp.isfinite(s), jnp.exp(s - smax_e), 0.0)
        denom = jax.lax.psum(
            segment_sum_sorted(expd, dst, indptr, n_ent, interpret),
            GRAPH_AXIS)
        denom_e = gather_rows_sorted(jnp.maximum(denom, 1e-9), dst, indptr,
                                     n_ent, interpret)
        alpha = expd / denom_e
        if flat:
            msg = z * jnp.dot(alpha, ind,
                              preferred_element_type=jnp.float32)
        else:
            msg = (zh * alpha[:, :, None]).reshape(-1, nh * dh)
        out = segment_sum_sorted(msg, dst, indptr, n_ent, interpret)
        return jax.lax.psum(out, GRAPH_AXIS)

    def attend(h, score_dst, layer, half: GraphHalf, csr):
        indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr = csr
        return _attend(h, score_dst, layer.rel_mult, layer.att_src,
                       layer.rel_bias, half.src, half.dst, half.rel,
                       half.norm, indptr, sperm, s_src, s_indptr,
                       rperm, r_rel, r_indptr)

    return attend


def _make_entity_sharded_attend(mesh, n_pad: int, nh: int, use_pallas: bool,
                                interpret: bool):
    """Entity-sharded (gather schedule) attention for one direction half —
    the two-pass distributed segment softmax the round-4 design note
    specified (models/__init__.py, now lifted for this schedule).

    Layout: entity rows (h) row-sharded ``P(graph)`` over ``n_pad`` rows;
    edge arrays + local CSR sharded along the edge partition as in
    ``edge_parallel.make_entity_sharded_aggregate_pallas``.  Per device:

      * ``all_gather(h)`` assembles the source/destination rows the local
        edge slice reads (the gather schedule's one transient (N, d) buffer),
      * local edge logits + a local segment-max, combined across shards with
        ``pmax`` — pass one of the distributed softmax (dst segments that
        straddle edge-shard boundaries meet exactly here),
      * local exp-sum, combined with ``psum`` — pass two (the denominator),
      * the weighted aggregation, reduced AND re-sharded with
        ``psum_scatter`` so the persistent entity state stays 1/G per device.

    Gradients: ``stop_gradient`` on the max (shift invariance — its true
    gradient is zero), the collectives' transposes (psum^T = broadcast,
    psum_scatter^T = all_gather, all_gather^T = psum_scatter), and on the
    kernel path the Pallas custom VJPs per shard.
    """
    import functools

    from jax.sharding import PartitionSpec as P

    from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS

    edge = P(GRAPH_AXIS)
    rep = P()
    row = P(GRAPH_AXIS)
    shardwise = P(GRAPH_AXIS)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(row, rep, rep, rep, rep,
                  edge, edge, edge, edge,
                  shardwise, shardwise, shardwise, shardwise,
                  shardwise, shardwise, shardwise),
        out_specs=row,
        check_vma=False,   # pallas out_shape carries no vma annotation
    )
    def _attend(h_local, rel_mult, att_src, att_dst, rel_bias,
                src, dst, rel, norm,
                indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr):
        indptr, sperm, s_src, s_indptr = (indptr[0], sperm[0], s_src[0],
                                          s_indptr[0])
        rdata = (rperm[0], r_indptr[0], r_rel[0])
        n_rel_rows = int(r_indptr.shape[1]) - 1
        dh = h_local.shape[1] // nh
        h = jax.lax.all_gather(h_local, GRAPH_AXIS, tiled=True)  # (n_pad, d)
        flat = RGAT_LAYOUT == "flat"
        if flat:
            a_src_mat, ind = _block_mats(att_src)
            a_dst_mat, _ = _block_mats(att_dst)
        # (n_pad, H) destination term recomputed from the gathered rows on
        # every shard: an (N, H) contraction is cheaper than a second
        # collective
        if flat:
            score_dst = jnp.dot(h, a_dst_mat,
                                preferred_element_type=jnp.float32)
        else:
            score_dst = jnp.einsum("nhd,hd->nh", h.reshape(n_pad, nh, dh),
                                   att_dst,
                                   preferred_element_type=jnp.float32)
        if use_pallas:
            from kgc_gcn_tpu.ops.spmm_pallas import (
                edge_compose, gather_rows_few, gather_rows_sorted,
                segment_max_sorted, segment_sum_sorted)
            z = edge_compose(h, rel_mult, src, rel, sperm, s_indptr, s_src,
                             rdata, n_pad, interpret)
            sd_e = gather_rows_sorted(score_dst, dst, indptr, n_pad,
                                      interpret)
            rb_e = gather_rows_few(rel_bias, rel, n_rel_rows, rdata,
                                   interpret)
        else:
            z = h[src] * rel_mult[rel]
            sd_e = score_dst[dst]
            rb_e = rel_bias[rel]
        zh = None if flat else z.reshape(-1, nh, dh)
        if flat:
            s = jnp.dot(z, a_src_mat,
                        preferred_element_type=jnp.float32) + sd_e + rb_e
        else:
            s = (jnp.einsum("ehd,hd->eh", zh, att_src,
                            preferred_element_type=jnp.float32)
                 + sd_e + rb_e)
        s = jax.nn.leaky_relu(s, 0.2)
        s = jnp.where(norm[:, None] > 0, s, -jnp.inf)
        if use_pallas:
            smax = segment_max_sorted(jax.lax.stop_gradient(s), dst, indptr,
                                      n_pad, interpret)
        else:
            smax = jax.lax.stop_gradient(jax.ops.segment_max(
                s, dst, num_segments=n_pad, indices_are_sorted=True))
        smax = jax.lax.pmax(smax, GRAPH_AXIS)          # softmax pass one
        smax_e = jnp.where(jnp.isfinite(smax), smax, 0.0)[dst]
        expd = jnp.where(jnp.isfinite(s), jnp.exp(s - smax_e), 0.0)
        if use_pallas:
            denom = jax.lax.psum(                      # softmax pass two
                segment_sum_sorted(expd, dst, indptr, n_pad, interpret),
                GRAPH_AXIS)
            denom_e = gather_rows_sorted(jnp.maximum(denom, 1e-9), dst,
                                         indptr, n_pad, interpret)
        else:
            denom = jax.lax.psum(
                jax.ops.segment_sum(expd, dst, num_segments=n_pad,
                                    indices_are_sorted=True), GRAPH_AXIS)
            denom_e = jnp.maximum(denom, 1e-9)[dst]
        alpha = expd / denom_e
        if flat:
            msg = z * jnp.dot(alpha, ind,
                              preferred_element_type=jnp.float32)
        else:
            msg = (zh * alpha[:, :, None]).reshape(-1, nh * dh)
        if use_pallas:
            out = segment_sum_sorted(msg, dst, indptr, n_pad, interpret)
        else:
            out = jax.ops.segment_sum(msg, dst, num_segments=n_pad,
                                      indices_are_sorted=True)
        return jax.lax.psum_scatter(
            out, GRAPH_AXIS, scatter_dimension=0, tiled=True)

    def attend(h_sharded, layer, half: GraphHalf, csr):
        indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr = csr
        return _attend(h_sharded, layer.rel_mult, layer.att_src,
                       layer.att_dst, layer.rel_bias,
                       half.src, half.dst, half.rel,
                       half.norm, indptr, sperm, s_src, s_indptr,
                       rperm, r_rel, r_indptr)

    return attend


class RGAT(DecoderFamilyMixin):
    """Model family 'rgat' — relation-typed GAT encoder + any decoder."""

    _state_cls = RGATState

    def __init__(self, cfg: Config, n_ent: int, n_rel: int, n_edge: int,
                 mesh=None):
        self.cfg = cfg
        self.n_ent = n_ent
        self.n_rel = n_rel
        self.n_edge = n_edge
        if cfg.num_heads < 1:
            raise ValueError(f"num_heads={cfg.num_heads} must be >= 1")
        self.nh = cfg.num_heads
        if cfg.gcn_out_dim % self.nh:
            raise ValueError(f"num_heads={self.nh} must divide "
                             f"gcn_out_dim={cfg.gcn_out_dim}")
        self._dec_init, self._dec_apply = DECODERS[cfg.decoder]
        # GSPMD cannot partition a Pallas custom call — under graph_axis > 1
        # the kernels run per shard via shard_map (prepare_edge_sharding;
        # the Trainer calls it), exactly like MGCN's edge-partition path
        self._use_pallas = bool(cfg.use_pallas)
        self.mesh = mesh
        self._edge_csr = None       # per-shard CSR metadata (edge partition)
        self._sharded_attend = None
        self._es_csr = None         # entity-sharded (gather) per-shard CSR
        self._es_attend = None
        self._es_npad = None
        if cfg.entity_sharded not in ("none", "gather"):
            # the ring/boundary schedules stream or compress ROW SETS; the
            # distributed softmax additionally needs the per-dst max and
            # exp-sum combined across shards, which the gather schedule gets
            # from two cheap (N, H) collectives (pmax + psum) — under
            # ring/boundary those would need their own compressed exchanges.
            # Designed, not built: fail fast rather than renormalize wrongly.
            raise ValueError(
                "model=rgat supports entity_sharded='gather' only (the "
                "two-pass distributed softmax rides the gather schedule's "
                "collectives; ring/boundary would need compressed max/denom "
                "exchanges — see models/rgat._make_entity_sharded_attend)")
        if cfg.entity_sharded == "gather" and mesh is None:
            raise ValueError(
                "entity_sharded needs a (data, graph) mesh — the CLI builds "
                "it from --graph_axis")

    def _layer_dims(self) -> List[Tuple[int, int]]:
        cfg = self.cfg
        dims = []
        d = cfg.gcn_in_dim
        for _ in range(max(1, cfg.num_layers)):
            dims.append((d, cfg.gcn_out_dim))
            d = cfg.gcn_out_dim
        return dims

    def prepare_edge_sharding(self, graph: Graph) -> None:
        """Per-shard attention kernels under the edge partition (the Trainer
        calls this when ``use_pallas`` and a graph mesh are active).

        GSPMD would reshard the Pallas custom calls' inputs to replicated, so
        the kernel path rides shard_map instead: each device runs the FULL
        single-chip attention body (logit kernels, segment softmax, weighted
        MXU aggregation) on its local dst-sorted edge slice with local CSR
        metadata (parallel/edge_parallel.build_local_csr), plus three cheap
        collectives at the segment-reduction points — pmax of the (N, H)
        softmax max, psum of the (N, H) denominator, psum of the (N, d_out)
        aggregate.  dst segments that straddle slice boundaries combine
        exactly through those collectives.  Idempotent."""
        if (not self._use_pallas or self.mesh is None
                or self._edge_csr is not None):
            return
        from kgc_gcn_tpu.parallel.edge_parallel import build_local_csr
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        g = self.mesh.shape.get(GRAPH_AXIS, 1)
        if g < 2:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kgc_gcn_tpu.parallel.distributed import put_global
        row = NamedSharding(self.mesh, P(GRAPH_AXIS))
        self._edge_csr = {
            name: tuple(put_global(a, row) for a in
                        build_local_csr(getattr(graph, name), g))
            for name in ("inb", "outb")}
        self._sharded_attend = _make_sharded_attend(
            self.mesh, self.n_ent, self.nh,
            next(iter(self.mesh.devices.flat)).platform != "tpu")

    def prepare_entity_sharding(self, graph: Graph) -> None:
        """Entity-sharded (gather schedule) attention: per-shard local CSR
        over the padded row space + the two-pass distributed-softmax attend
        (:func:`_make_entity_sharded_attend`).  The Trainer calls this;
        idempotent."""
        if self.cfg.entity_sharded != "gather" or self._es_csr is not None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kgc_gcn_tpu.parallel.distributed import put_global
        from kgc_gcn_tpu.parallel.edge_parallel import build_local_csr
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        g = self.mesh.shape[GRAPH_AXIS]
        if g < 2:
            raise ValueError("entity_sharded needs a graph axis > 1")
        n_pad = -(-self.n_ent // g) * g
        row = NamedSharding(self.mesh, P(GRAPH_AXIS))
        self._es_csr = {
            name: tuple(put_global(a, row) for a in
                        build_local_csr(getattr(graph, name), g,
                                        n_rows_out=n_pad))
            for name in ("inb", "outb")}
        self._es_npad = n_pad
        self._es_attend = _make_entity_sharded_attend(
            self.mesh, n_pad, self.nh, self._use_pallas,
            next(iter(self.mesh.devices.flat)).platform != "tpu")

    def init(self, key: jax.Array) -> Tuple[RGATParams, RGATState]:
        cfg = self.cfg
        n_rel2 = 2 * self.n_rel
        dh = cfg.gcn_out_dim // self.nh
        keys = jax.random.split(key, 3 + 6 * max(1, cfg.num_layers))
        layers = []
        for i, (din, dout) in enumerate(self._layer_dims()):
            k = keys[3 + 6 * i: 9 + 6 * i]
            layers.append(RGATLayerParams(
                weight=xavier_uniform(k[0], (din, dout)),
                rel_mult=jnp.ones((n_rel2, dout))
                + 0.1 * xavier_uniform(k[1], (n_rel2, dout)),
                att_src=xavier_uniform(k[2], (self.nh, dh)),
                att_dst=xavier_uniform(k[3], (self.nh, dh)),
                rel_bias=jnp.zeros((n_rel2, self.nh)),
                self_weight=xavier_uniform(k[5], (din, dout)),
            ))
        dec_p, dec_s = self._dec_init(keys[0], cfg, self.n_ent)
        params = RGATParams(
            entity_embedding=xavier_uniform(
                keys[1], (self.n_ent, cfg.gcn_in_dim)),
            relation_embedding=xavier_uniform(
                keys[2], (n_rel2, cfg.gcn_out_dim)),
            layers=layers,
            decoder=dec_p,
        )
        return params, RGATState(decoder=dec_s)

    def encode(
        self,
        params: RGATParams,
        state: RGATState,
        graph: Graph,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array, Any]:
        cfg = self.cfg
        rngs = rngs or {}
        x = params.entity_embedding
        up = self._use_pallas
        interp = up and jax.default_backend() != "tpu"
        for i, layer in enumerate(params.layers):
            if cfg.entity_sharded == "gather":
                # entity rows sharded over the graph axis: pad to the
                # axis-divisible row space, run the two-pass distributed
                # softmax attend per half (prepare_entity_sharding), slice
                # the padding rows back off
                if self._es_attend is None:
                    raise RuntimeError(
                        "call prepare_entity_sharding(graph) before encode "
                        "(the Trainer does this automatically)")
                from jax.sharding import NamedSharding, PartitionSpec as P

                from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
                row = NamedSharding(self.mesh, P(GRAPH_AXIS))
                xp = jnp.pad(x, ((0, self._es_npad - self.n_ent), (0, 0)))
                xp = jax.lax.with_sharding_constraint(xp, row)
                h = xp @ layer.weight                  # row-sharded (n_pad, d)
                agg = (self._es_attend(h, layer, graph.inb,
                                       self._es_csr["inb"])
                       + self._es_attend(h, layer, graph.outb,
                                         self._es_csr["outb"])
                       + xp @ layer.self_weight)[: self.n_ent]
                x = jax.nn.relu(agg)
                x = dropout(x, cfg.gcn_drop, rngs.get(f"layer{i}"), train)
                continue
            h = x @ layer.weight                              # ONE MXU matmul
            if self._edge_csr is not None:
                # per-shard kernels under the edge partition (shard_map;
                # prepare_edge_sharding) — GSPMD would replicate the custom
                # calls' inputs and run every edge on every device
                nh, dh = layer.att_src.shape
                if RGAT_LAYOUT == "flat":
                    a_dst_mat, _ = _block_mats(layer.att_dst)
                    score_dst = jnp.dot(
                        h, a_dst_mat, preferred_element_type=jnp.float32)
                else:
                    score_dst = jnp.einsum(
                        "nhd,hd->nh", h.reshape(self.n_ent, nh, dh),
                        layer.att_dst, preferred_element_type=jnp.float32)
                agg = (self._sharded_attend(h, score_dst, layer, graph.inb,
                                            self._edge_csr["inb"])
                       + self._sharded_attend(h, score_dst, layer, graph.outb,
                                              self._edge_csr["outb"])
                       + x @ layer.self_weight)
            else:
                agg = (_attend_half(h, layer, graph.inb, self.n_ent,
                                    use_pallas=up, interpret=interp)
                       + _attend_half(h, layer, graph.outb, self.n_ent,
                                      use_pallas=up, interpret=interp)
                       + x @ layer.self_weight)
            x = jax.nn.relu(agg)
            x = dropout(x, cfg.gcn_drop, rngs.get(f"layer{i}"), train)
        return x, params.relation_embedding, None

