"""R-GCN family: multi-layer relational GCN with basis / block-diagonal
relation weights and a DistMult-style decoder.

Covers BASELINE.json configs 1 ("2-layer relational GCN + DistMult decoder")
and 3 ("basis-decomposition relation weights + negative sampling").  The
reference repo itself has no R-GCN — this is a framework family built on the
same Graph container and aggregation ops as MGCN.

TPU schedules (the interesting part — a naive per-edge ``W[rel_e]`` gather is
``O(E * d_in * d_out)`` memory and hopeless on any hardware):

  * **basis** (``W_r = Σ_b a_rb V_b``): because projection is linear and the
    coefficients depend only on the relation, aggregate per basis FIRST in
    ``d_in`` space — ``agg_b[v] = Σ_e a[rel_e, b] * norm_e * x[src_e]`` (B
    segment-sums on the VPU) — then one einsum ``(B, N, d_in) x (B, d_in,
    d_out) -> (N, d_out)`` on the MXU.  FLOPs: ``O(E*B*d_in) + O(B*N*d_in*
    d_out)``; no per-edge weight gather at all.
  * **block** (``W_r = blockdiag(W_r^1..W_r^B)``): the weight genuinely varies
    per edge, so edges are processed in static-size chunks under ``lax.scan``;
    each chunk gathers its ``(C, B, d_in/B, d_out/B)`` weights into VMEM-scale
    working set and scatters its partial segment-sum.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from kgc_gcn_tpu.config import Config
from kgc_gcn_tpu.data.graph import Graph, GraphHalf
from kgc_gcn_tpu.models.common import dropout, xavier_uniform
from kgc_gcn_tpu.models.decoders import DECODERS
from kgc_gcn_tpu.models.family_base import DecoderFamilyMixin


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RGCNLayerParams:
    basis: Optional[jax.Array]   # (B, d_in, d_out) basis matrices, or None
    coeff: Optional[jax.Array]   # (2R, B) basis coefficients, or None
    blocks: Optional[jax.Array]  # (2R, B, d_in/B, d_out/B) block weights, or None
    self_weight: jax.Array       # (d_in, d_out) — W_0 self-connection


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RGCNParams:
    entity_embedding: jax.Array    # (N, d_in)
    relation_embedding: jax.Array  # (2R, d_out) — decoder relation vectors
    layers: List[RGCNLayerParams]
    decoder: Any


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RGCNState:
    decoder: Any


def _basis_aggregate(
    x: jax.Array,          # (N, d_in)
    layer: RGCNLayerParams,
    half: GraphHalf,
    n_ent: int,
    use_pallas: bool = False,
    interpret: bool = False,
    bwd_plan=None,
) -> jax.Array:
    """Basis-decomposed relational aggregation for one direction half.

    With ``use_pallas`` the aggregation runs the FUSED basis kernel
    (ops/spmm_pallas.basis_aggregate_fused): the (E, B*d_in) weighted
    expansion lives only in VMEM — the XLA path's forward was 69 ms/step
    of scatter-add + 14.6 ms of materialized expansion at FB15k config 3
    (round-4 trace) — and the backward's d_x/d_coeff scatters route
    through the src-sorted CSR kernel / one-hot MXU matmul.
    """
    if use_pallas:
        from kgc_gcn_tpu.ops.spmm_pallas import basis_aggregate_fused
        plan, plan_meta = bwd_plan if bwd_plan is not None else (None, None)
        agg = basis_aggregate_fused(
            x, layer.coeff, half.src, half.dst, half.rel, half.norm,
            half.indptr, half.sperm, half.s_indptr, half.s_src,
            (half.rperm, half.r_indptr, half.r_rel), plan,
            n_ent, layer.coeff.shape[1], interpret, plan_meta)  # (N, B, d)
    else:
        a = layer.coeff[half.rel]                  # (E, B)
        msg = x[half.src] * half.norm[:, None]     # (E, d_in)
        # (E, B, d_in) weighted copies -> B segment sums (XLA scatter)
        weighted = msg[:, None, :] * a[:, :, None]
        agg = jax.ops.segment_sum(
            weighted, half.dst, num_segments=n_ent, indices_are_sorted=True
        )                                          # (N, B, d_in)
    basis = layer.basis
    if agg.shape[2] != basis.shape[1]:
        # BASIS_PAD='through': the kernel keeps the lane-padded d_pad width
        # end-to-end; zero basis rows make the extra lanes exactly inert
        # (and the backward cotangent arrives padded — no per-step pad of
        # the big (N, B*d) stream)
        basis = jnp.pad(
            basis, ((0, 0), (0, agg.shape[2] - basis.shape[1]), (0, 0)))
    return jnp.einsum(
        "nbd,bdo->no", agg, basis,
        preferred_element_type=jnp.float32)


def _block_aggregate(
    x: jax.Array,
    layer: RGCNLayerParams,
    half: GraphHalf,
    n_ent: int,
    chunk: int = 4096,
) -> jax.Array:
    """Block-diagonal relational aggregation, edge-chunked under lax.scan."""
    nb, bin_, bout = layer.blocks.shape[1], layer.blocks.shape[2], layer.blocks.shape[3]
    e_pad = half.src.shape[0]
    chunk = min(chunk, e_pad)
    n_chunks = -(-e_pad // chunk)
    pad = n_chunks * chunk - e_pad

    def pad1(arr, fill=0):
        return jnp.pad(arr, (0, pad), constant_values=fill) if pad else arr

    src = pad1(half.src).reshape(n_chunks, chunk)
    dst = pad1(half.dst, n_ent - 1).reshape(n_chunks, chunk)
    rel = pad1(half.rel).reshape(n_chunks, chunk)
    norm = pad1(half.norm).reshape(n_chunks, chunk)

    def body(acc, args):
        s, d, r, w = args
        xs = (x[s] * w[:, None]).reshape(chunk, nb, bin_)   # (C, B, d_in/B)
        wb = layer.blocks[r]                                # (C, B, bin, bout)
        m = jnp.einsum("cbi,cbio->cbo", xs, wb,
                       preferred_element_type=jnp.float32).reshape(chunk, nb * bout)
        # chunks are contiguous slices of the dst-sorted half (tail padding
        # fills with n_ent-1, the maximal id) — each chunk stays sorted
        acc = acc + jax.ops.segment_sum(m, d, num_segments=n_ent,
                                        indices_are_sorted=True)
        return acc, None

    init = jnp.zeros((n_ent, nb * bout), jnp.float32)
    out, _ = jax.lax.scan(body, init, (src, dst, rel, norm))
    return out


def basis_compose(x_rows, coeff, rel_ids, et_rows, norm):
    """Entity-sharded basis compose (edge_parallel.mult_compose contract):
    the (E, B*d_in) basis-weighted message expansion.  ``coeff`` rides the
    schedules' replicated relation-table slot; ``et_rows`` (a (E, 1) ones
    placeholder — RGCN has no per-edge table) is ignored.  The basis einsum
    runs AFTER the exchange, row-sharded (models/rgcn.py encode)."""
    del et_rows
    a = coeff[rel_ids]                                   # (E, B)
    msg = x_rows * norm[:, None]                         # (E, d_in)
    return (msg[:, None, :] * a[:, :, None]).reshape(msg.shape[0], -1)


class RGCN(DecoderFamilyMixin):
    """Model family 'rgcn' — ``cfg.num_bases`` / ``cfg.num_blocks`` select the
    relation-weight decomposition (basis by default)."""

    _state_cls = RGCNState

    def __init__(self, cfg: Config, n_ent: int, n_rel: int, n_edge: int,
                 mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.n_ent = n_ent
        self.n_rel = n_rel
        self.n_edge = n_edge
        if cfg.num_blocks > 0:
            self.mode = "block"
            self.nb = cfg.num_blocks
        else:
            self.mode = "basis"
            self.nb = cfg.num_bases if cfg.num_bases > 0 else min(2 * n_rel, 30)
        self._dec_init, self._dec_apply = DECODERS[cfg.decoder]
        self._es = None        # built by prepare_entity_sharding
        self._es_ones = None   # (2, E_pad, 1) per-edge placeholder
        self._bwd_plans = None  # built by prepare_kernels (basis bwd band)
        if cfg.entity_sharded != "none":
            if mesh is None:
                raise ValueError(
                    "entity_sharded needs a (data, graph) mesh — the CLI "
                    "builds it from --graph_axis")
            if self.mode != "basis":
                raise ValueError(
                    "entity_sharded with model=rgcn supports the basis "
                    "decomposition only (num_blocks=0): the block weights "
                    "vary per edge, so the compose cannot ride the shared "
                    "exchange schedules")

    @property
    def boundary_stats(self):
        """Comm-volume accounting per half (boundary schedule only)."""
        return self._es.boundary_stats if self._es is not None else None

    def prepare_kernels(self, graph: Graph) -> None:
        """Host-side backward-band layout for the basis kernel (must run
        OUTSIDE jit — it reads the CSR pointers as numpy).  The Trainer
        calls this; without it the kernel path falls back to the XLA
        backward (correct, measured 103 ms/step slower at FB15k config 3).
        Idempotent."""
        if (self.mode != "basis" or not self.cfg.use_pallas
                or self._bwd_plans is not None):
            return
        # mirror encode's gating: with entity sharding or a sharded graph
        # axis the kernel path is off (up=False below), so building and
        # device-placing the E_pad2-sized plan arrays would waste host and
        # device memory at exactly the scales sharding targets
        if (self.cfg.entity_sharded != "none"
                or (self.mesh is not None
                    and self.mesh.shape.get("graph", 1) > 1)):
            return
        # the band backward kernel stores d_a in a fixed 128-column block
        # (_basis_bwd_kernel da scratch/out) — wider bases would index past
        # it; fall back to the XLA backward (plan=None) rather than corrupt
        if self.nb > 128:
            import logging
            logging.warning(
                "num_bases=%d exceeds the backward band kernel's 128-column "
                "d_a block; the basis backward runs the XLA fallback "
                "(forward kernel still active)", self.nb)
            self._bwd_plans = {}   # mark prepared: deliberate XLA backward
            return
        from kgc_gcn_tpu.ops.spmm_pallas import build_basis_bwd_plan
        self._bwd_plans = {
            name: build_basis_bwd_plan(getattr(graph, name), self.n_ent)
            for name in ("inb", "outb")}

    def prepare_entity_sharding(self, graph: Graph) -> None:
        """Entity-sharded schedules via the shared plumbing
        (parallel/entity_sharding.py) with the basis compose.  The Trainer
        calls this; idempotent."""
        if self.cfg.entity_sharded == "none" or self._es is not None:
            return
        from kgc_gcn_tpu.parallel.entity_sharding import (
            EntityShardedAggregator)
        self._es = EntityShardedAggregator(
            self.cfg, self.mesh, self.n_ent, compose=basis_compose,
            interpret=next(iter(self.mesh.devices.flat)).platform != "tpu")
        self._es.prepare(graph)
        e_pad = int(graph.inb.src.shape[0])
        ones = jnp.ones((2, e_pad, 1), jnp.float32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kgc_gcn_tpu.parallel.distributed import put_global
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        self._es_ones = put_global(
            ones, NamedSharding(self.mesh, P(None, GRAPH_AXIS)))

    def _layer_dims(self) -> List[Tuple[int, int]]:
        cfg = self.cfg
        dims = []
        d = cfg.gcn_in_dim
        for _ in range(max(1, cfg.num_layers)):
            dims.append((d, cfg.gcn_out_dim))
            d = cfg.gcn_out_dim
        return dims

    def init(self, key: jax.Array) -> Tuple[RGCNParams, RGCNState]:
        cfg = self.cfg
        n_rel2 = 2 * self.n_rel
        keys = jax.random.split(key, 4 + 3 * max(1, cfg.num_layers))
        layers = []
        for i, (din, dout) in enumerate(self._layer_dims()):
            k1, k2, k3 = keys[4 + 3 * i: 7 + 3 * i]
            if self.mode == "block":
                if din % self.nb or dout % self.nb:
                    raise ValueError(
                        f"num_blocks={self.nb} must divide dims ({din},{dout})")
                layers.append(RGCNLayerParams(
                    basis=None, coeff=None,
                    blocks=xavier_uniform(
                        k1, (n_rel2, self.nb, din // self.nb, dout // self.nb)),
                    self_weight=xavier_uniform(k3, (din, dout)),
                ))
            else:
                layers.append(RGCNLayerParams(
                    basis=xavier_uniform(k1, (self.nb, din, dout)),
                    coeff=xavier_uniform(k2, (n_rel2, self.nb)),
                    blocks=None,
                    self_weight=xavier_uniform(k3, (din, dout)),
                ))
        dec_p, dec_s = self._dec_init(keys[0], cfg, self.n_ent)
        params = RGCNParams(
            entity_embedding=xavier_uniform(
                keys[1], (self.n_ent, cfg.gcn_in_dim)),
            relation_embedding=xavier_uniform(
                keys[2], (n_rel2, cfg.gcn_out_dim)),
            layers=layers,
            decoder=dec_p,
        )
        return params, RGCNState(decoder=dec_s)

    def encode(
        self,
        params: RGCNParams,
        state: RGCNState,
        graph: Graph,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array, Any]:
        cfg = self.cfg
        rngs = rngs or {}
        if self.mode == "basis":
            up = cfg.use_pallas and cfg.entity_sharded == "none" \
                and (self.mesh is None
                     or self.mesh.shape.get("graph", 1) == 1)
            interp = up and jax.default_backend() != "tpu"
            plans = self._bwd_plans or {}
            if (up and self._bwd_plans is None
                    and not getattr(self, "_warned_no_plan", False)):
                # Trainer-less constructions (serve.py Predictor, custom
                # scripts) that skip prepare_kernels silently ran the XLA
                # backward at 4.7x the step cost — say so once
                import logging
                logging.warning(
                    "use_pallas is set but prepare_kernels(graph) was not "
                    "called: the basis backward falls back to XLA scatters "
                    "(measured ~4.7x slower at FB15k config 3). Call "
                    "model.prepare_kernels(graph) once (the Trainer does "
                    "this automatically).")
                self._warned_no_plan = True

            def agg(x_, layer_, half_, n_):
                name = "inb" if half_ is graph.inb else "outb"
                return _basis_aggregate(
                    x_, layer_, half_, n_, use_pallas=up, interpret=interp,
                    bwd_plan=plans.get(name))
        else:
            agg = _block_aggregate
        x = params.entity_embedding
        for i, layer in enumerate(params.layers):
            if cfg.entity_sharded != "none":
                # shared exchange schedules (gather/ring/boundary) with the
                # basis compose; the einsum runs after, row-sharded
                if self._es is None:
                    raise RuntimeError(
                        "call prepare_entity_sharding(graph) before encode "
                        "(the Trainer does this automatically)")
                in_m, out_m = self._es.agg_pair(
                    x, layer.coeff, self._es_ones, graph)

                def proj(m):
                    return jnp.einsum(
                        "nbd,bdo->no", m.reshape(self.n_ent, self.nb, -1),
                        layer.basis, preferred_element_type=jnp.float32)

                h = proj(in_m) + proj(out_m) + x @ layer.self_weight
            else:
                h = (agg(x, layer, graph.inb, self.n_ent)
                     + agg(x, layer, graph.outb, self.n_ent)
                     + x @ layer.self_weight)
            x = jax.nn.relu(h)
            x = dropout(x, cfg.gcn_drop, rngs.get(f"layer{i}"), train)
        return x, params.relation_embedding, None

