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
import numpy as np
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


def make_entity_sharded_aggregate(mesh: Mesh, n_ent: int):
    """Aggregation with the ENTITY state sharded too (graphs whose (N, d)
    activations/embeddings exceed one chip's HBM — the scaling axis the
    reference caps at single-GPU memory, SURVEY.md §5.7).

    Layout: ``x`` row-sharded along ``graph`` ((N/G, d) per device, N padded
    to a multiple of the axis size); edge arrays + per-edge table sharded as
    in :func:`make_sharded_aggregate`; relation table replicated (it is tiny).

    Schedule per device — the standard halo-exchange recipe:

      * ``all_gather(x)`` over ICI assembles the source rows this device's
        edges read (transient (N, d) buffer; XLA streams it),
      * compose + local segment-sum into an (N, d) partial,
      * ``psum_scatter`` reduces the partials AND re-shards the result in one
        collective — each device keeps only its (N/G, d) output rows, so the
        persistent entity state never exceeds 1/G of the graph.

    Returns ``agg(x_sharded, rel_all, etab, half) -> (N_pad/G, d) per-device
    rows`` (global view: (N_pad, d) row-sharded along ``graph``).
    """
    g_size = mesh.shape[GRAPH_AXIS]
    n_pad = -(-n_ent // g_size) * g_size

    edge = P(GRAPH_AXIS)
    rep = P()
    row = P(GRAPH_AXIS)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(row, rep, edge, edge, edge, edge, edge),
        out_specs=row,
    )
    def _agg(x_local, rel_all, etab, src, dst, rel, norm):
        x = jax.lax.all_gather(x_local, GRAPH_AXIS, tiled=True)   # (N_pad, d)
        msg = (x[src] * rel_all[rel] * etab) * norm[:, None]
        local = jax.ops.segment_sum(
            msg, dst, num_segments=n_pad, indices_are_sorted=True)
        return jax.lax.psum_scatter(
            local, GRAPH_AXIS, scatter_dimension=0, tiled=True)

    def agg(x_sharded, rel_all, etab, half: GraphHalf):
        return _agg(x_sharded, rel_all, etab,
                    half.src, half.dst, half.rel, half.norm)

    agg.n_pad = n_pad
    return agg


def build_ring_blocks(half: GraphHalf, g_size: int, n_pad: int):
    """Static ring metadata: each device's local edges grouped by SOURCE shard.

    For the ring schedule (:func:`make_ring_aggregate`) device ``i`` at step
    ``t`` holds entity shard ``(i - t) mod G`` and must process exactly its
    local edges whose source lives in that shard.  The graph is static, so
    this grouping is computed once on the host:

      * ``blocks[i, s, :]`` — device ``i``'s LOCAL edge positions (0..E_loc-1)
        with ``src`` in shard ``s``, padded by repeating the block's last
        entry (keeps ``dst`` non-decreasing within the padded block, so the
        per-step segment-sum stays on the sorted fast path),
      * ``mask[i, s, :]`` — 1.0 on real entries, 0.0 on padding.

    Returns arrays shaped ``(G, G, B_max)`` to be sharded ``P(graph)`` on
    axis 0.
    """
    src = np.asarray(half.src)
    e_pad = src.shape[0]
    assert e_pad % g_size == 0 and n_pad % g_size == 0
    e_loc = e_pad // g_size
    rows_per = n_pad // g_size

    per_dev = []
    b_max = 1
    for i in range(g_size):
        ls = src[i * e_loc: (i + 1) * e_loc]
        shard = np.minimum(ls // rows_per, g_size - 1)
        idxs = [np.nonzero(shard == s)[0].astype(np.int32)
                for s in range(g_size)]
        per_dev.append(idxs)
        b_max = max(b_max, max(len(ix) for ix in idxs))

    blocks = np.zeros((g_size, g_size, b_max), np.int32)
    mask = np.zeros((g_size, g_size, b_max), np.float32)
    for i, idxs in enumerate(per_dev):
        for s, ix in enumerate(idxs):
            n = len(ix)
            if n:
                blocks[i, s, :n] = ix
                blocks[i, s, n:] = ix[-1]
                mask[i, s, :n] = 1.0
    return jnp.asarray(blocks), jnp.asarray(mask)


def make_ring_aggregate(mesh: Mesh, n_ent: int):
    """Entity-sharded aggregation WITHOUT the gathered-x buffer: a ring
    exchange of entity shards overlapped with per-shard partial aggregation
    (the graph analog of ring attention; SURVEY.md §5.7, §7 'hard parts').

    Where :func:`make_entity_sharded_aggregate` assembles the full (N, d)
    source matrix with one ``all_gather``, this schedule keeps only ONE
    (N/G, d) shard in flight: at every step each device composes+aggregates
    the edges whose sources live in the currently-held shard (static block
    metadata from :func:`build_ring_blocks`), then ``ppermute``s the shard one
    hop around the ring — XLA issues the permute asynchronously, so transfer
    overlaps the next block's compute.  The (N, d) partial accumulator is
    reduced and re-sharded by the final ``psum_scatter`` exactly as before.

    Returns ``agg(x_sharded, rel_all, etab, half, blocks, mask)`` with the
    same output layout as the all_gather variant.
    """
    g_size = mesh.shape[GRAPH_AXIS]
    n_pad = -(-n_ent // g_size) * g_size
    rows_per = n_pad // g_size
    ring = [(j, (j + 1) % g_size) for j in range(g_size)]

    edge = P(GRAPH_AXIS)
    rep = P()
    row = P(GRAPH_AXIS)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(row, rep, edge, edge, edge, edge, edge, edge, edge),
        out_specs=row,
    )
    def _agg(x_local, rel_all, etab, src, dst, rel, norm, blocks, mask):
        blocks, mask = blocks[0], mask[0]            # (G, B), (G, B)
        i = jax.lax.axis_index(GRAPH_AXIS)
        d = x_local.shape[1]

        # lax.scan (NOT fori_loop) so the schedule is reverse-differentiable:
        # training gradients flow back through the ring (ppermute transposes
        # to the inverted permutation, psum_scatter to all_gather)
        def step(carry, t):
            x_buf, acc = carry
            s = jax.lax.rem(i - t + g_size, g_size)  # shard currently held
            idx = jnp.take(blocks, s, axis=0)        # (B,) local edge ids
            m = jnp.take(mask, s, axis=0)
            xr = x_buf[jnp.take(src, idx) - s * rows_per]
            msg = (xr * rel_all[jnp.take(rel, idx)]
                   * jnp.take(etab, idx, axis=0))
            msg = msg * (jnp.take(norm, idx) * m)[:, None]
            acc = acc + jax.ops.segment_sum(
                msg, jnp.take(dst, idx), num_segments=n_pad,
                indices_are_sorted=True)
            x_buf = jax.lax.ppermute(x_buf, GRAPH_AXIS, ring)
            return (x_buf, acc), None

        # the zero accumulator must be marked device-varying over the ring
        # axis or the carry types disagree (shard_map vma tracking)
        acc0 = jax.lax.pcast(jnp.zeros((n_pad, d), x_local.dtype),
                             (GRAPH_AXIS,), to="varying")
        (_, acc), _ = jax.lax.scan(
            step, (x_local, acc0), jnp.arange(g_size, dtype=jnp.int32))
        return jax.lax.psum_scatter(
            acc, GRAPH_AXIS, scatter_dimension=0, tiled=True)

    def agg(x_sharded, rel_all, etab, half: GraphHalf, blocks, mask):
        return _agg(x_sharded, rel_all, etab,
                    half.src, half.dst, half.rel, half.norm, blocks, mask)

    agg.n_pad = n_pad
    return agg
