"""Shared entity-sharding schedule plumbing (``cfg.entity_sharded``).

The gather / ring / boundary schedules (parallel/edge_parallel.py,
parallel/boundary.py) shard the ENTITY activations over the graph mesh axis —
the beyond-HBM scaling axis (SURVEY.md §5.7).  Every model family whose
per-half aggregation is gather→compose→segment-sum can ride them; what
differs per family is only the per-edge ``compose`` (see
``edge_parallel.mult_compose`` for the contract):

  * MGCN: ``x[src] * rel_all[rel] * etab * norm`` (compose=None here selects
    it, which also unlocks the Pallas kernel sub-paths for the gather and
    boundary schedules — the kernels hard-code the multiplicative form).
  * RGCN basis: ``(x[src]*norm) ⊗ coeff[rel]`` flattened to (E, B*d_in)
    (models/rgcn.py) — XLA block compute (widths change per layer, and the
    basis einsum runs after the exchange, row-sharded).

This class owns what used to live inside models/mgcn.py
(``prepare_entity_sharding`` / ``_agg_entity_sharded``): building the
schedule once per (graph, mesh) on the host, placing the static metadata
with ``P(graph)`` sharding, and running the padded/constrained per-half
aggregation.  RGAT is NOT routed through this class: its segment softmax
needs a two-pass distributed reduction (max then sum over dst rows that may
straddle shard boundaries) BEFORE the weighted aggregation, so it has its
own gather-schedule implementation (models/rgat._make_entity_sharded_attend,
round 5: all_gather + pmax/psum + psum_scatter); ring/boundary with RGAT
remain a fail-fast (their compressed exchanges would need dedicated
max/denominator legs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kgc_gcn_tpu.data.graph import Graph


class EntityShardedAggregator:
    """Builds and runs one entity-sharded schedule for a (cfg, mesh, graph).

    ``compose=None`` selects the multiplicative MGCN form and enables the
    kernel sub-paths (gather+CSR, boundary per-block CSR) when
    ``cfg.use_pallas``; a custom compose runs the XLA block compute.
    """

    def __init__(self, cfg, mesh, n_ent: int, compose=None,
                 interpret: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.n_ent = n_ent
        self.compose = compose
        self.interpret = interpret
        self._agg = None          # schedule callable (gather/ring variants)
        self._blocks = None       # ring static metadata per half
        self._csr = None          # gather+pallas per-shard CSR per half
        self._boundary = None     # boundary aggregates per half
        self.boundary_stats = None
        self.n_pad = None

    def _put_row(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kgc_gcn_tpu.parallel.distributed import put_global
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        row = NamedSharding(self.mesh, P(GRAPH_AXIS))
        return jax.tree.map(lambda a: put_global(a, row), tree)

    def prepare(self, graph: Graph) -> None:
        """Host-side schedule construction (outside jit). Idempotent."""
        cfg = self.cfg
        if cfg.entity_sharded == "none" or self._agg is not None \
                or self._boundary is not None:
            return
        from kgc_gcn_tpu.parallel.edge_parallel import (
            build_ring_blocks, make_entity_sharded_aggregate,
            make_ring_aggregate)
        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        g = self.mesh.shape[GRAPH_AXIS]
        if g < 2:
            raise ValueError("entity_sharded needs a graph axis > 1")
        kernel_path = cfg.use_pallas and self.compose is None
        if cfg.entity_sharded == "ring":
            agg = make_ring_aggregate(self.mesh, self.n_ent,
                                      compose=self.compose)
            self._blocks = {
                name: self._put_row(
                    build_ring_blocks(getattr(graph, name), g, agg.n_pad))
                for name in ("inb", "outb")}
        elif cfg.entity_sharded == "boundary":
            import types

            from kgc_gcn_tpu.parallel.boundary import (
                build_boundary_plan, make_boundary_aggregate)
            n_pad = -(-self.n_ent // g) * g
            aggs, stats = {}, {}
            for name in ("inb", "outb"):
                plan, st = build_boundary_plan(getattr(graph, name), g, n_pad)
                aggs[name] = make_boundary_aggregate(
                    self.mesh, self.n_ent, self._put_row(plan),
                    use_pallas=kernel_path, interpret=self.interpret,
                    msg_dtype=cfg.compute_dtype, compose=self.compose)
                stats[name] = st
            self._boundary = aggs
            self.boundary_stats = stats
            agg = types.SimpleNamespace(n_pad=n_pad)
        elif kernel_path:
            from kgc_gcn_tpu.parallel.edge_parallel import (
                build_local_csr, make_entity_sharded_aggregate_pallas)
            agg = make_entity_sharded_aggregate_pallas(
                self.mesh, self.n_ent, self.interpret, cfg.compute_dtype)
            self._csr = {
                name: self._put_row(build_local_csr(
                    getattr(graph, name), g, n_rows_out=agg.n_pad))
                for name in ("inb", "outb")}
        else:
            agg = make_entity_sharded_aggregate(self.mesh, self.n_ent,
                                                compose=self.compose)
        self._agg = agg
        self.n_pad = agg.n_pad

    def agg_pair(self, x, rel_all, et_full, graph: Graph):
        """Both halves' sharded aggregation: pad + row-constrain x, run the
        schedule per half, slice the padding rows back off (downstream
        BN/combine must see exactly the N real entities).

        ``et_full`` is a (2, E_pad, d_et) per-edge operand pair (the MGCN
        table; families without one pass (2, E_pad, 1) ones).
        Returns ``(in_agg, out_agg)`` each (N, d_msg), row-sharded."""
        if self.n_pad is None:
            raise RuntimeError(
                "call prepare(graph) before agg_pair (the Trainer calls "
                "prepare_entity_sharding automatically)")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS
        row = NamedSharding(self.mesh, P(GRAPH_AXIS))
        xp = jnp.pad(x, ((0, self.n_pad - self.n_ent), (0, 0)))
        xp = jax.lax.with_sharding_constraint(xp, row)
        if self.cfg.entity_sharded == "ring":
            b_in, m_in = self._blocks["inb"]
            b_out, m_out = self._blocks["outb"]
            in_agg = self._agg(xp, rel_all, et_full[0], graph.inb, b_in, m_in)
            out_agg = self._agg(xp, rel_all, et_full[1], graph.outb,
                                b_out, m_out)
        elif self.cfg.entity_sharded == "boundary":
            in_agg = self._boundary["inb"](xp, rel_all, et_full[0], graph.inb)
            out_agg = self._boundary["outb"](
                xp, rel_all, et_full[1], graph.outb)
        elif self._csr is not None:    # gather schedule on the kernel path
            in_agg = self._agg(xp, rel_all, et_full[0], graph.inb,
                               self._csr["inb"])
            out_agg = self._agg(xp, rel_all, et_full[1], graph.outb,
                                self._csr["outb"])
        else:
            in_agg = self._agg(xp, rel_all, et_full[0], graph.inb)
            out_agg = self._agg(xp, rel_all, et_full[1], graph.outb)
        return in_agg[: self.n_ent], out_agg[: self.n_ent]
