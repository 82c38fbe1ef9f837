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


def mult_compose(x_rows, rel_all, rel_ids, et_rows, norm):
    """The MGCN/CompGCN multiplicative message (reference model.py:111-118):
    the default ``compose`` for every sharded schedule.  Schedules accept any
    ``compose(x_rows (E, d_in), rel_all (replicated table), rel_ids (E,),
    et_rows (E, d_et), norm (E,)) -> (E, d_msg)`` — e.g. RGCN's basis
    expansion (models/rgcn.py) — so one exchange implementation serves every
    model family whose aggregation is gather→compose→segment-sum."""
    return (x_rows * rel_all[rel_ids] * et_rows) * norm[:, None]


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


def make_local_agg(n_rows: int, msg_dtype: str, interpret: bool):
    """Per-shard compose + Pallas segment-sum with a custom VJP — the local
    building block shared by the edge-partitioned (n_rows = N) and
    entity-sharded (n_rows = N_pad) schedules.  Mirrors the single-chip
    backward: d_x via the kernel over the local src-sorted permutation,
    d_rel via _segment_sum_few (one-hot MXU / rel-sorted kernel), d_etab
    dense and resident."""
    from kgc_gcn_tpu.ops.spmm_pallas import (
        _segment_sum_few, segment_sum_pallas)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
    def local_agg(d_orig, x, rel_all, etab, src, dst, rel, norm,
                  indptr, sperm, s_src, s_indptr, rdata):
        msg = (x[src] * rel_all[rel] * etab) * norm[:, None]
        if msg_dtype != "float32":
            msg = msg.astype(msg_dtype)
        return segment_sum_pallas(msg, dst, indptr, n_rows,
                                  interpret=interpret)[:, :d_orig]

    def local_fwd(d_orig, x, rel_all, etab, src, dst, rel, norm,
                  indptr, sperm, s_src, s_indptr, rdata):
        out = local_agg(d_orig, x, rel_all, etab, src, dst, rel, norm,
                        indptr, sperm, s_src, s_indptr, rdata)
        return out, (x, rel_all, etab, src, dst, rel, norm,
                     sperm, s_src, s_indptr, rdata)

    def local_bwd(d_orig, res, g):
        (x, rel_all, etab, src, dst, rel, norm,
         sperm, s_src, s_indptr, rdata) = res
        xg = x[src]
        rg = rel_all[rel]
        gd = g[dst] * norm[:, None]
        contrib = gd * rg * etab
        d_rel_in = gd * xg * etab
        d_etab = gd * xg * rg
        if msg_dtype != "float32":
            contrib = contrib.astype(msg_dtype)
            d_rel_in = d_rel_in.astype(msg_dtype)
        dx = segment_sum_pallas(
            contrib[sperm], s_src, s_indptr, x.shape[0],
            interpret=interpret)[:, :d_orig]
        d_rel = _segment_sum_few(d_rel_in, rel, rel_all.shape[0],
                                 rdata=rdata, interpret=interpret)[:, :d_orig]
        return (dx, d_rel, d_etab) + (None,) * 9

    local_agg.defvjp(local_fwd, local_bwd)
    return local_agg


def build_local_csr(half: GraphHalf, g_size: int, n_rows_out=None):
    """Per-shard CSR metadata for running the Pallas segment-sum kernel on
    each device's LOCAL edge slice (host-side, static graph).

    The edge partition splits the dst-sorted edge array into ``g_size``
    contiguous slices, so each slice is itself dst-sorted and covers a dst
    range: the local CSR pointers are just the global ones clipped to the
    slice.  The backward's d_x segment-sum needs each slice SRC-sorted, so a
    local src permutation + pointers are precomputed per shard too.

    Returns arrays with a leading (G,) shard axis, to be device_put with
    ``P(graph)`` sharding on axis 0:
      ``indptr (G, N+1)``, ``sperm (G, E_loc)``, ``s_src (G, E_loc)``,
      ``s_indptr (G, N+1)``, plus the rel-sorted trio ``rperm/r_rel
      (G, E_loc)`` and ``r_indptr (G, 2R+2)`` (the backward's d_rel routes
      through the Pallas CSR kernel at large relation vocabularies, exactly
      like the single-chip path).
    """
    from kgc_gcn_tpu.parallel.distributed import host_array
    src = host_array(half.src)    # halves may be sharded across PROCESSES —
    dst = host_array(half.dst)    # np.asarray would raise on non-addressable
    rel = host_array(half.rel)    # shards (host_array replicates first)
    e_pad = src.shape[0]
    assert e_pad % g_size == 0, (e_pad, g_size)
    e_loc = e_pad // g_size
    n_rows = int(half.indptr.shape[0]) - 1
    if n_rows_out is not None:
        # entity-sharded use: the kernel's row space is the padded N_pad
        # (psum_scatter needs an axis-divisible row count) — extend the CSR
        # pointers with empty rows
        assert n_rows_out >= n_rows
        n_rows = n_rows_out
    n_rel_rows = int(half.r_indptr.shape[0]) - 1
    g_indptr = host_array(half.indptr).astype(np.int64)
    g_indptr = np.concatenate(
        [g_indptr, np.full(n_rows + 1 - len(g_indptr), g_indptr[-1])])

    indptr = np.zeros((g_size, n_rows + 1), np.int32)
    sperm = np.zeros((g_size, e_loc), np.int32)
    s_src = np.zeros((g_size, e_loc), np.int32)
    s_indptr = np.zeros((g_size, n_rows + 1), np.int32)
    rperm = np.zeros((g_size, e_loc), np.int32)
    r_rel = np.zeros((g_size, e_loc), np.int32)
    r_indptr = np.zeros((g_size, n_rel_rows + 1), np.int32)
    for i in range(g_size):
        lo = i * e_loc
        indptr[i] = np.clip(g_indptr - lo, 0, e_loc)
        ls = src[lo: lo + e_loc]
        order = np.argsort(ls, kind="stable").astype(np.int32)
        sperm[i] = order
        s_src[i] = ls[order]
        s_indptr[i, 1:] = np.cumsum(np.bincount(ls, minlength=n_rows))
        lr = rel[lo: lo + e_loc]
        rorder = np.argsort(lr, kind="stable").astype(np.int32)
        rperm[i] = rorder
        r_rel[i] = lr[rorder]
        r_indptr[i, 1:] = np.cumsum(np.bincount(lr, minlength=n_rel_rows))
    return (jnp.asarray(indptr), jnp.asarray(sperm),
            jnp.asarray(s_src), jnp.asarray(s_indptr),
            jnp.asarray(rperm), jnp.asarray(r_rel), jnp.asarray(r_indptr))


def make_pallas_sharded_aggregate(mesh: Mesh, n_ent: int, interpret: bool,
                                  msg_dtype: str = "float32"):
    """Edge-partitioned aggregation where each device runs the Pallas MXU
    segment-sum kernel (ops/spmm_pallas.py) on ITS local edge slice.

    The GSPMD default cannot partition a Pallas custom call — it reshards the
    kernel inputs to replicated, so ``use_pallas`` under a graph axis would
    silently run the whole edge list on every device.  This shard_map variant
    keeps the kernel on the partition: per device, compose local messages,
    kernel-aggregate into the full (N, d) accumulator using the local CSR
    pointers (each dst-sorted slice covers a dst range; rows outside it get
    zero chunks), then one ``psum``.  The custom VJP mirrors the single-chip
    one per shard: d_x via the kernel over the LOCAL src-sorted permutation
    (+ psum), d_rel via a one-hot MXU matmul (+ psum), d_etab dense and
    LOCAL (the positional table slice lives on this device — stays sharded).

    Returns ``agg(x, rel_all, etab, half, local_csr) -> (N, d)`` where
    ``local_csr`` comes from :func:`build_local_csr` device_put row-sharded.
    """
    edge = P(GRAPH_AXIS)
    rep = P()
    shardwise = P(GRAPH_AXIS)   # leading (G, ...) metadata axis

    local_agg = make_local_agg(n_ent, msg_dtype, interpret)

    def make(d_orig):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(rep, rep, edge, edge, edge, edge, edge,
                      shardwise, shardwise, shardwise, shardwise,
                      shardwise, shardwise, shardwise),
            out_specs=rep,
            # pallas_call's out_shape carries no vma annotation — use the
            # classic (unchecked) shard_map semantics for this region
            check_vma=False,
        )
        def _agg(x, rel_all, etab, src, dst, rel, norm,
                 indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr):
            out = local_agg(d_orig, x, rel_all, etab, src, dst, rel, norm,
                            indptr[0], sperm[0], s_src[0], s_indptr[0],
                            (rperm[0], r_indptr[0], r_rel[0]))
            return jax.lax.psum(out, GRAPH_AXIS)
        return _agg

    cache = {}

    def agg(x, rel_all, etab, half: GraphHalf, local_csr):
        d_orig = x.shape[1]
        if d_orig not in cache:
            cache[d_orig] = make(d_orig)
        indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr = local_csr
        return cache[d_orig](x, rel_all, etab, half.src, half.dst, half.rel,
                             half.norm, indptr, sperm, s_src, s_indptr,
                             rperm, r_rel, r_indptr)

    return agg


def make_entity_sharded_aggregate(mesh: Mesh, n_ent: int, compose=None):
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
    if compose is None:
        compose = mult_compose

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
        msg = compose(x[src], rel_all, rel, etab, norm)
        local = jax.ops.segment_sum(
            msg, dst, num_segments=n_pad, indices_are_sorted=True)
        return jax.lax.psum_scatter(
            local, GRAPH_AXIS, scatter_dimension=0, tiled=True)

    def agg(x_sharded, rel_all, etab, half: GraphHalf):
        return _agg(x_sharded, rel_all, etab,
                    half.src, half.dst, half.rel, half.norm)

    agg.n_pad = n_pad
    return agg


def make_entity_sharded_aggregate_pallas(mesh: Mesh, n_ent: int,
                                         interpret: bool,
                                         msg_dtype: str = "float32"):
    """Entity-sharded (all_gather + psum_scatter) aggregation with the LOCAL
    segment-sum running through the Pallas MXU kernel — the combination of
    both scaling axes: entity activations row-sharded over ``graph`` AND the
    per-shard edge work on the kernel path.

    Row space is ``n_pad`` (axis-divisible) throughout: the local CSR must be
    built with ``build_local_csr(half, G, n_rows_out=n_pad)``.  Gradients
    flow through the kernel's custom VJP locally and the collectives'
    transposes globally (psum_scatter^T = all_gather, all_gather^T =
    psum_scatter).

    Returns ``agg(x_sharded (n_pad, d) P(graph), rel_all, etab, half,
    local_csr) -> (n_pad, d) row-sharded``.
    """
    g_size = mesh.shape[GRAPH_AXIS]
    n_pad = -(-n_ent // g_size) * g_size

    edge = P(GRAPH_AXIS)
    rep = P()
    row = P(GRAPH_AXIS)
    shardwise = P(GRAPH_AXIS)

    local_agg = make_local_agg(n_pad, msg_dtype, interpret)

    def make(d_orig):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(row, rep, edge, edge, edge, edge, edge,
                      shardwise, shardwise, shardwise, shardwise,
                      shardwise, shardwise, shardwise),
            out_specs=row,
            check_vma=False,   # pallas out_shape carries no vma annotation
        )
        def _agg(x_local, rel_all, etab, src, dst, rel, norm,
                 indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr):
            x = jax.lax.all_gather(x_local, GRAPH_AXIS, tiled=True)
            out = local_agg(d_orig, x, rel_all, etab, src, dst, rel, norm,
                            indptr[0], sperm[0], s_src[0], s_indptr[0],
                            (rperm[0], r_indptr[0], r_rel[0]))
            return jax.lax.psum_scatter(
                out, GRAPH_AXIS, scatter_dimension=0, tiled=True)
        return _agg

    cache = {}

    def agg(x_sharded, rel_all, etab, half: GraphHalf, local_csr):
        d_orig = x_sharded.shape[1]
        if d_orig not in cache:
            cache[d_orig] = make(d_orig)
        indptr, sperm, s_src, s_indptr, rperm, r_rel, r_indptr = local_csr
        return cache[d_orig](x_sharded, rel_all, etab, half.src, half.dst,
                             half.rel, half.norm, indptr, sperm, s_src,
                             s_indptr, rperm, r_rel, r_indptr)

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
    from kgc_gcn_tpu.parallel.distributed import host_array
    src = host_array(half.src)   # process-safe under multi-host sharding
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


def make_ring_aggregate(mesh: Mesh, n_ent: int, compose=None):
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
    if compose is None:
        compose = mult_compose

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
        # accumulator width = the COMPOSE's output width (differs from d_in
        # for e.g. RGCN's (E, B*d_in) basis expansion)
        d = jax.eval_shape(
            compose, jax.ShapeDtypeStruct((1, x_local.shape[1]),
                                          x_local.dtype),
            rel_all, jnp.zeros((1,), jnp.int32),
            jax.ShapeDtypeStruct((1, etab.shape[1]), etab.dtype),
            jnp.zeros((1,), norm.dtype)).shape[1]

        # lax.scan (NOT fori_loop) so the schedule is reverse-differentiable:
        # training gradients flow back through the ring (ppermute transposes
        # to the inverted permutation, psum_scatter to all_gather)
        def step(carry, t):
            x_buf, acc = carry
            s = jax.lax.rem(i - t + g_size, g_size)  # shard currently held
            idx = jnp.take(blocks, s, axis=0)        # (B,) local edge ids
            m = jnp.take(mask, s, axis=0)
            xr = x_buf[jnp.take(src, idx) - s * rows_per]
            msg = compose(xr, rel_all, jnp.take(rel, idx),
                          jnp.take(etab, idx, axis=0),
                          jnp.take(norm, idx) * m)
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
