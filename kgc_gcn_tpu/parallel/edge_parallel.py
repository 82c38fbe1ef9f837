"""Explicit edge-partitioned aggregation under ``jax.shard_map``
(BASELINE.json config 5).

The default multi-chip path lets GSPMD place the collectives: edge arrays are
sharded along the ``graph`` mesh axis (parallel/mesh.py) and XLA inserts the
cross-shard reduction for the segment-sum.  This module spells the same
computation out with explicit SPMD collectives — useful both as the
documented contract for what the sharded encoder does and as the substrate
for the next optimization step (boundary-entity all-to-all with
compute/communication overlap instead of a full psum):

  * each device composes messages for ITS contiguous CSR slice of the edge
    list (entity table and relation table replicated),
  * scatter-adds them locally into an (N, d) partial accumulator,
  * one ``psum`` over the ``graph`` axis produces the full aggregation on
    every device; gradients flow through the psum automatically (its
    transpose is the identity broadcast).

Because each shard of a dst-sorted edge array is itself sorted, the local
segment-sum keeps the ``indices_are_sorted`` fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from kgc_gcn_tpu.data.graph import GraphHalf
from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS


def make_sharded_aggregate(mesh: Mesh, n_ent: int):
    """Build the shard_map'd aggregation for one direction half.

    Returns ``agg(x, rel_all, etab, half) -> (N, d_in)``, numerically
    equal to ``ops.scatter.aggregate_half`` (up to float reassociation across
    shards).  ``half``'s edge arrays must be device-put with the
    ``graph``-axis sharding (parallel.mesh.shard_graph).
    """

    edge = P(GRAPH_AXIS)
    rep = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rep, rep, edge, edge, edge, edge, edge),
        out_specs=rep,
    )
    def _agg(x, rel_all, etab, src, dst, rel, norm):
        msg = (x[src] * rel_all[rel] * etab) * norm[:, None]
        local = jax.ops.segment_sum(
            msg, dst, num_segments=n_ent, indices_are_sorted=True)
        return jax.lax.psum(local, GRAPH_AXIS)

    def agg(x, rel_all, etab, half: GraphHalf):
        """``etab`` is the half's positional edge-embedding slice; because the
        table layout follows the half's dst-sorted edge order, sharding it
        along ``graph`` puts every edge's embedding row on the SAME device as
        the edge itself — per-edge gathers stay local by construction (the
        'edge-embedding table sharding' hard part of SURVEY.md §7)."""
        return _agg(x, rel_all, etab, half.src, half.dst, half.rel, half.norm)

    return agg
