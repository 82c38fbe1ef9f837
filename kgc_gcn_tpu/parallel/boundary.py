"""Boundary-compressed, overlapped entity exchange (``--entity_sharded
boundary``) — the graph analog of halo exchange in stencil codes.

The ``gather`` schedule (edge_parallel.make_entity_sharded_aggregate) moves
every entity row twice per layer per half: an ``all_gather`` assembles the
full (N, d) source matrix on every device and a ``psum_scatter`` reduces the
full (N, d) partial accumulator.  The ``ring`` schedule cuts the transient
buffer to one shard but still moves all N rows around the ring plus the full
psum_scatter.  Both ignore that each device's edges only *read* a subset of
rows (the sources referenced by its local edges) and only *write* a subset
(the dst rows covered by its contiguous dst-sorted slice).

This schedule exchanges exactly those subsets.  The graph is static, so the
boundary sets are host-precomputed once (:func:`build_boundary_plan`):

  input side — for each (device ``i``, source shard ``s``) the sorted unique
  source rows ``U[i][s]`` that ``i``'s edges read from ``s``.  At step ``t``
  every device ``s`` sends ``U[(s+t) % G][s]`` (a compact gather from its own
  x shard) to device ``(s+t) % G`` with a shift-``t`` ``ppermute``.  All G-1
  permutes depend only on ``x_local``, so they are issued before any block
  compute and XLA's latency-hiding scheduler overlaps the transfers with the
  local aggregation (the SURVEY.md §2.2/§5.7 "overlap the exchange with local
  aggregation" clause).  Edges are grouped by source shard into static blocks
  (like the ring's build_ring_blocks) whose source indices are pre-remapped
  into the compact received buffers.

  output side — each device accumulates into its *unique local dst rows*
  only (a (D_max, d) compressed accumulator, not (N, d)).  Rows owned by the
  device's own entity shard are added locally; rows owned by shard
  ``(i+k) % G`` are routed with a shift-``k`` ``ppermute`` of the compact
  row block and scatter-added on the receiver.  Because the edge slices are
  contiguous in dst-sorted order, a row only straddles devices at slice
  boundaries — collisions are handled by the scatter-add.

Every exchange step is sized INDIVIDUALLY (the per-``t``/per-``k`` maximum
over devices, not one global maximum): the unrolled schedule gives each step
its own static shape, so one hot source shard (a hub-heavy partition, e.g.
after a degree-concentrating ordering) does not inflate every other step's
padding — measured 2.3x padded-volume difference at WN18RR scale
(BENCH_NOTES round 3).  This is also why the exchange is a pipeline of
shift-``t`` ppermutes rather than one literal ``jax.lax.all_to_all``: the
all-to-all primitive needs one uniform split size across every (sender,
receiver) pair — exactly the global-max padding the per-step sizing avoids
— while the decomposed form moves the same pairs with per-step shapes and
lets XLA overlap each transfer independently.

Everything is expressed in plain differentiable JAX ops (gather, sorted
segment-sum, ppermute, scatter-add), so training gradients flow through the
exchange via the standard transposes (ppermute^T = inverse shift).

Reference counterpart: the reference caps graph scale at single-GPU memory
(reference model.py keeps the full (N, d) state resident); this module is
the TPU-native scaling axis SURVEY.md §5.7 calls for, with communication
proportional to the partition's *boundary* rather than to N.  The comm
volume is asserted in tests/test_boundary.py and shrinks further under the
locality partitioner (data/partition.py).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from kgc_gcn_tpu.data.graph import GraphHalf
from kgc_gcn_tpu.parallel.mesh import GRAPH_AXIS


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BoundaryPlan:
    """Static per-device exchange metadata (leading axis = G, shard P(graph)).

    Per-step arrays live in tuples indexed like ``t_steps``/``k_steps`` and
    are sized per step; the step lists and sizes are static aux data, so a
    plan travels through jit/shard_map without retracing hazards.
    """

    # --- local block (sources in the device's own shard) ---
    blk0: jax.Array       # int32 (G, B0) local edge positions; padded by
                          #   repeating the last entry (keeps dst sorted)
    blk0_mask: jax.Array  # f32 (G, B0)
    loc0: jax.Array       # int32 (G, B0) — src - i*rows_per (into x_local)
    # --- input exchange steps (tuples over t_steps) ---
    blk_t: tuple          # each int32 (G, B_e[t]) — edges with src in shard
                          #   (i - t) % G
    blk_mask_t: tuple     # each f32 (G, B_e[t])
    loc_t: tuple          # each int32 (G, B_e[t]) — position in the received
                          #   buffer
    send_t: tuple         # each int32 (G, B_max[t]) — local x rows device i
                          #   sends at step t to device (i + t) % G
                          #   (= U[(i+t)%G][i] - i*rows_per, sorted)
    dst_loc: jax.Array    # int32 (G, E_loc) — each local edge's position in
                          #   the device's unique-dst compressed row space
    # --- output routing (compressed accumulator -> owner shards) ---
    self_pos: jax.Array   # int32 (G, S0) — accumulator rows owned locally
    self_dst: jax.Array   # int32 (G, S0) — their local output rows
    self_mask: jax.Array  # f32 (G, S0)
    out_send_k: tuple     # each int32 (G, S[k]) — accumulator rows sent at
                          #   output step k to device (i + k) % G
    out_mask_k: tuple     # each f32 (G, S[k])
    recv_pos_k: tuple     # each int32 (G, S[k]) — receiver-local output rows
                          #   for step k arrivals (from (i - k) % G)
    # --- per-block CSR metadata for the Pallas kernel path (use_pallas):
    #     each block's dst_loc ids are non-decreasing (the block is an
    #     increasing subset of a dst-sorted slice), so the MXU CSR segment-sum
    #     kernel applies per block; the backward's d_x needs each block
    #     SRC-sorted within its compact buffer row space ---
    seg0: jax.Array = None        # int32 (G, B0) — dst_loc per local-block
                                  #   entry (precomputed, saves a gather)
    indptr0: jax.Array = None     # int32 (G, d_max+1)
    sperm0: jax.Array = None      # int32 (G, B0) — argsort by loc0
    sloc0: jax.Array = None       # int32 (G, B0) — loc0[sperm0]
    s_indptr0: jax.Array = None   # int32 (G, rows_per+1)
    seg_t: tuple = ()             # per t: int32 (G, B_e[t])
    indptr_t: tuple = ()          # per t: int32 (G, d_max+1)
    sperm_t: tuple = ()           # per t: int32 (G, B_e[t])
    sloc_t: tuple = ()            # per t: int32 (G, B_e[t])
    s_indptr_t: tuple = ()        # per t: int32 (G, B_max[t]+1)
    # --- static ---
    t_steps: tuple = _static(default=())  # input steps with any traffic
    k_steps: tuple = _static(default=())  # output steps with any traffic
    d_max: int = _static(default=1)       # compressed accumulator rows
    rows_per: int = _static(default=1)    # entity rows per device (n_pad/G)


def build_boundary_plan(half: GraphHalf, g_size: int, n_pad: int):
    """Host-side boundary analysis of one direction half.

    Returns ``(plan, stats)``; ``stats`` carries the comm-volume accounting
    (padded rows actually shipped per device per layer vs the ``n_pad`` rows
    the gather/ring schedules move) — asserted in tests and reported by
    ``scripts/boundary_report.py``.
    """
    from kgc_gcn_tpu.parallel.distributed import host_array
    src = host_array(half.src)
    dst = host_array(half.dst)
    e_pad = int(src.shape[0])
    assert e_pad % g_size == 0 and n_pad % g_size == 0, (e_pad, n_pad, g_size)
    e_loc = e_pad // g_size
    rows_per = n_pad // g_size
    G = g_size

    U = [[np.empty(0, np.int64)] * G for _ in range(G)]
    blocks = [[None] * G for _ in range(G)]
    uniq_d, inv_d = [], []
    for i in range(G):
        ls = src[i * e_loc: (i + 1) * e_loc]
        ld = dst[i * e_loc: (i + 1) * e_loc]
        u, inv = np.unique(ld, return_inverse=True)
        uniq_d.append(u)
        inv_d.append(inv.astype(np.int32))
        sh = np.minimum(ls // rows_per, G - 1)
        for t in range(G):
            s = (i - t) % G
            pos = np.nonzero(sh == s)[0].astype(np.int32)
            blocks[i][t] = pos
            if t:
                U[i][s] = np.unique(ls[pos])

    t_steps = tuple(
        t for t in range(1, G)
        if any(len(U[i][(i - t) % G]) for i in range(G)))
    d_max = max(1, max(len(u) for u in uniq_d))

    def fill_block(t, b_e, n_buf):
        """Block arrays + the kernel path's per-block CSR/sort metadata.

        ``n_buf`` is the block's source-buffer row count (``rows_per`` for
        the local block, the step's padded send width otherwise).  Padding
        entries repeat the last real entry, so ``seg`` stays non-decreasing
        and ``loc`` padding lands on a real buffer row; their mask is 0 so
        both the forward sum and the d_x backward see zero contributions.
        """
        blk = np.zeros((G, b_e), np.int32)
        mask = np.zeros((G, b_e), np.float32)
        loc = np.zeros((G, b_e), np.int32)
        seg = np.zeros((G, b_e), np.int32)
        indptr = np.zeros((G, d_max + 1), np.int32)
        sperm = np.zeros((G, b_e), np.int32)
        sloc = np.zeros((G, b_e), np.int32)
        s_indptr = np.zeros((G, n_buf + 1), np.int32)
        for i in range(G):
            pos = blocks[i][t]
            n = len(pos)
            if not n:
                continue
            blk[i, :n] = pos
            blk[i, n:] = pos[-1]
            mask[i, :n] = 1.0
            ls_blk = src[i * e_loc + pos]
            if t == 0:
                lo = ls_blk - i * rows_per
            else:
                lo = np.searchsorted(U[i][(i - t) % G], ls_blk)
            loc[i, :n] = lo
            loc[i, n:] = lo[-1]
            ids = inv_d[i][pos]
            seg[i, :n] = ids
            seg[i, n:] = ids[-1]
            indptr[i] = np.searchsorted(seg[i], np.arange(d_max + 1), "left")
            order = np.argsort(loc[i], kind="stable").astype(np.int32)
            sperm[i] = order
            sloc[i] = loc[i][order]
            s_indptr[i] = np.searchsorted(sloc[i], np.arange(n_buf + 1),
                                          "left")
        return tuple(jnp.asarray(a) for a in
                     (blk, mask, loc, seg, indptr, sperm, sloc, s_indptr))

    b0 = max(1, max(len(blocks[i][0]) for i in range(G)))
    (blk0, blk0_mask, loc0, seg0, indptr0,
     sperm0, sloc0, s_indptr0) = fill_block(0, b0, rows_per)

    blk_t, blk_mask_t, loc_t, send_t = [], [], [], []
    seg_t, indptr_t, sperm_t, sloc_t, s_indptr_t = [], [], [], [], []
    for t in t_steps:
        b_e = max(1, max(len(blocks[i][t]) for i in range(G)))
        b_max = max(1, max(len(U[(i + t) % G][i]) for i in range(G)))
        b, m, lo, sg, ip, sp, sl, sip = fill_block(t, b_e, b_max)
        blk_t.append(b)
        blk_mask_t.append(m)
        loc_t.append(lo)
        seg_t.append(sg)
        indptr_t.append(ip)
        sperm_t.append(sp)
        sloc_t.append(sl)
        s_indptr_t.append(sip)
        send = np.zeros((G, b_max), np.int32)
        for i in range(G):
            u = U[(i + t) % G][i]
            if len(u):
                send[i, : len(u)] = u - i * rows_per
        send_t.append(jnp.asarray(send))

    # output routing: group each device's unique dst rows by owner offset
    koffs = [((uniq_d[i] // rows_per) - i) % G for i in range(G)]
    s0 = max(1, max(int(np.sum(k == 0)) for k in koffs))
    k_counts = {k: max(int(np.sum(koffs[i] == k)) for i in range(G))
                for k in range(1, G)}
    k_steps = tuple(k for k in range(1, G) if k_counts[k])

    self_pos = np.zeros((G, s0), np.int32)
    self_dst = np.zeros((G, s0), np.int32)
    self_mask = np.zeros((G, s0), np.float32)
    in_rows = np.zeros(G, np.int64)   # real boundary rows received per device
    out_rows = np.zeros(G, np.int64)  # real accumulator rows sent per device
    for i in range(G):
        u, koff = uniq_d[i], koffs[i]
        p = np.nonzero(koff == 0)[0].astype(np.int32)
        self_pos[i, : len(p)] = p
        self_dst[i, : len(p)] = u[p] - i * rows_per
        self_mask[i, : len(p)] = 1.0
        in_rows[i] = sum(len(U[i][s]) for s in range(G))
    out_send_k, out_mask_k, recv_pos_k = [], [], []
    for k in k_steps:
        s_max = k_counts[k]
        o_send = np.zeros((G, s_max), np.int32)
        o_mask = np.zeros((G, s_max), np.float32)
        r_pos = np.zeros((G, s_max), np.int32)
        for i in range(G):
            u, koff = uniq_d[i], koffs[i]
            p = np.nonzero(koff == k)[0].astype(np.int32)
            if not len(p):
                continue
            o_send[i, : len(p)] = p
            o_mask[i, : len(p)] = 1.0
            r = (i + k) % G
            r_pos[r, : len(p)] = u[p] - r * rows_per
            out_rows[i] += len(p)
        out_send_k.append(jnp.asarray(o_send))
        out_mask_k.append(jnp.asarray(o_mask))
        recv_pos_k.append(jnp.asarray(r_pos))

    plan = BoundaryPlan(
        blk0=blk0, blk0_mask=blk0_mask, loc0=loc0,
        blk_t=tuple(blk_t), blk_mask_t=tuple(blk_mask_t),
        loc_t=tuple(loc_t), send_t=tuple(send_t),
        dst_loc=jnp.asarray(np.stack(inv_d)),
        self_pos=jnp.asarray(self_pos), self_dst=jnp.asarray(self_dst),
        self_mask=jnp.asarray(self_mask),
        out_send_k=tuple(out_send_k), out_mask_k=tuple(out_mask_k),
        recv_pos_k=tuple(recv_pos_k),
        seg0=seg0, indptr0=indptr0, sperm0=sperm0, sloc0=sloc0,
        s_indptr0=s_indptr0,
        seg_t=tuple(seg_t), indptr_t=tuple(indptr_t),
        sperm_t=tuple(sperm_t), sloc_t=tuple(sloc_t),
        s_indptr_t=tuple(s_indptr_t),
        t_steps=t_steps, k_steps=k_steps, d_max=d_max, rows_per=rows_per)
    stats = {
        "n_pad": n_pad,
        "rows_per": rows_per,
        # what one device actually ships per layer for this half
        "in_rows_real_max": int(in_rows.max()),
        "in_rows_padded": int(sum(s.shape[1] for s in send_t)),
        "out_rows_real_max": int(out_rows.max()),
        "out_rows_padded": int(sum(s.shape[1] for s in out_send_k)),
        # what the gather schedule ships: all_gather receives (G-1)/G * n_pad
        # rows and psum_scatter another (G-1)/G * n_pad per device
        "gather_rows": 2 * (G - 1) * n_pad // G,
        "d_max": d_max,
    }
    return plan, stats


def make_boundary_aggregate(mesh: Mesh, n_ent: int, plan: BoundaryPlan,
                            use_pallas: bool = False,
                            interpret: bool = False,
                            msg_dtype: str = "float32",
                            compose=None):
    """Build ``agg(x_sharded, rel_all, etab, half) -> (n_pad, d) row-sharded``
    for one half, numerically equal to the gather/ring schedules (up to float
    reassociation) with boundary-compressed exchange.

    The plan's arrays must be device_put with ``P(graph)`` on axis 0 (the
    model's prepare_entity_sharding does this).

    With ``use_pallas`` each block's aggregation runs through the MXU CSR
    segment-sum kernel instead of XLA's scatter lowering (the path measured
    −25% single-chip, BENCH_NOTES): a block is an increasing subset of a
    dst-sorted slice, so its compressed dst ids are non-decreasing and the
    per-block ``indptr``/src-sorted metadata precomputed by
    :func:`build_boundary_plan` drive exactly the single-chip custom-VJP
    schedule (edge_parallel.make_local_agg) per block — forward sum and the
    backward d_x both on the kernel, d_rel via the one-hot MXU matmul.
    """
    g_size = mesh.shape[GRAPH_AXIS]
    n_pad = -(-n_ent // g_size) * g_size
    assert plan.rows_per == n_pad // g_size
    t_steps, k_steps, d_max = plan.t_steps, plan.k_steps, plan.d_max
    rows_per = plan.rows_per

    edge = P(GRAPH_AXIS)
    rep = P()
    row = P(GRAPH_AXIS)

    local_agg = None
    if use_pallas:
        if compose is not None:
            raise ValueError("the boundary kernel path composes "
                             "multiplicatively; custom compose needs "
                             "use_pallas=False")
        from kgc_gcn_tpu.parallel.edge_parallel import make_local_agg
        local_agg = make_local_agg(d_max, msg_dtype, interpret)
    if compose is None:
        from kgc_gcn_tpu.parallel.edge_parallel import mult_compose
        compose = mult_compose

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(row, rep, edge, edge, edge, row),
        out_specs=row,
        # pallas_call's out_shape carries no vma annotation — the kernel
        # path needs the classic (unchecked) shard_map semantics
        check_vma=not use_pallas,
    )
    def _agg(x_local, rel_all, etab, rel, norm, pl: BoundaryPlan):
        d = x_local.shape[1]

        # issue EVERY boundary-row transfer first: each depends only on
        # x_local, so the transfers ride ICI while the blocks aggregate
        bufs = []
        for j, t in enumerate(t_steps):
            perm = [(q, (q + t) % g_size) for q in range(g_size)]
            bufs.append(jax.lax.ppermute(
                x_local[pl.send_t[j][0]], GRAPH_AXIS, perm))

        def block(blk, blk_mask, loc, xbuf):
            e = blk[0]
            msg = compose(xbuf[loc[0]], rel_all, rel[e], etab[e],
                          norm[e] * blk_mask[0])
            return jax.ops.segment_sum(
                msg, pl.dst_loc[0][e], num_segments=d_max,
                indices_are_sorted=True)

        def block_pallas(blk, blk_mask, loc, seg, indptr, sperm, sloc,
                         s_indptr, xbuf):
            e = blk[0]
            return local_agg(
                d, xbuf, rel_all, etab[e], loc[0], seg[0], rel[e],
                norm[e] * blk_mask[0], indptr[0], sperm[0], sloc[0],
                s_indptr[0], None)

        if use_pallas:
            acc = block_pallas(pl.blk0, pl.blk0_mask, pl.loc0, pl.seg0,
                               pl.indptr0, pl.sperm0, pl.sloc0, pl.s_indptr0,
                               x_local)
            for j in range(len(t_steps)):
                acc = acc + block_pallas(
                    pl.blk_t[j], pl.blk_mask_t[j], pl.loc_t[j], pl.seg_t[j],
                    pl.indptr_t[j], pl.sperm_t[j], pl.sloc_t[j],
                    pl.s_indptr_t[j], bufs[j])
        else:
            acc = block(pl.blk0, pl.blk0_mask, pl.loc0, x_local)
            for j in range(len(t_steps)):
                acc = acc + block(pl.blk_t[j], pl.blk_mask_t[j], pl.loc_t[j],
                                  bufs[j])

        # route the compressed accumulator rows to their owner shards
        # (width follows the compose output — e.g. RGCN's B*d_in expansion)
        out = jnp.zeros((rows_per, acc.shape[1]), acc.dtype)
        if not use_pallas:   # vma tracking is off on the kernel path
            out = jax.lax.pcast(out, (GRAPH_AXIS,), to="varying")
        out = out.at[pl.self_dst[0]].add(
            acc[pl.self_pos[0]] * pl.self_mask[0][:, None])
        for j, k in enumerate(k_steps):
            perm = [(q, (q + k) % g_size) for q in range(g_size)]
            sendbuf = acc[pl.out_send_k[j][0]] * pl.out_mask_k[j][0][:, None]
            out = out.at[pl.recv_pos_k[j][0]].add(
                jax.lax.ppermute(sendbuf, GRAPH_AXIS, perm))
        return out

    def agg(x_sharded, rel_all, etab, half: GraphHalf, plan_dev=None):
        return _agg(x_sharded, rel_all, etab, half.rel, half.norm,
                    plan_dev if plan_dev is not None else plan)

    agg.n_pad = n_pad
    return agg
