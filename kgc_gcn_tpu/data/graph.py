"""Device-resident graph container.

The reference keeps a PyG ``Data`` object with a ``[2, 2E]`` edge index, per-edge
``(rel, edge_id)`` attributes, and recomputes symmetric degree norms inside every
forward pass (reference model.py:96-97, data_loader.py:132-157).  Here the graph
is a frozen pytree of static-shape ``int32``/``float32`` arrays, built once on
the host:

  * the bidirectional edge list is split into its two halves up front — the
    "in" half is the original orientation ``(src → dst, rel)``, the "out" half
    is the reversed orientation ``(dst → src, rel + R)`` (reference
    model.py:88-90, data_loader.py:144-145);
  * each half is sorted by destination (CSR order) so on-device aggregation is
    a sorted segment-sum / tiled Pallas kernel, and a row-pointer array is kept;
  * the degree norms are precomputed at build time — they are static per graph,
    so recomputing them per forward (as the reference does) is pure waste.  The
    reference's exact formula is kept: degree is counted over ROW occurrences
    of the half only, but indexed at both endpoints (model.py:72-80 — note this
    is NOT a textbook symmetric norm; SURVEY.md §2.4.10);
  * edge arrays are padded to a multiple of ``pad_to`` with zero-norm entries so
    shapes stay static and shard evenly across a device mesh.

Self-loop messages never appear here: the reference materializes N loop edges
with a shared loop relation (model.py:93-94); because loop edges are the
identity map, their aggregation is a dense elementwise op — no scatter needed
(see kgc_gcn_tpu.ops.scatter.loop_messages).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GraphHalf:
    """One direction of the bidirectional edge list, CSR-sorted by dst.

    ``sperm``/``s_indptr`` give the same edges sorted by SOURCE: the backward
    pass of aggregation scatters gradients into ``x[src]``, and the Pallas
    segment-sum kernel needs sorted segments — so both orders are precomputed.
    """

    src: jax.Array       # int32 (E_pad,)
    dst: jax.Array       # int32 (E_pad,) — non-decreasing
    rel: jax.Array       # int32 (E_pad,) — relation id (out half: rel + R)
    eid: jax.Array       # int32 (E_pad,) — REFERENCE edge id of each position
                         #   (data_loader.py:148 numbering: forward edge i is
                         #   i, its reverse E+i); 2E on padding.  Pure mapping
                         #   metadata: the per-edge embedding table is stored
                         #   in THIS positional order (models/mgcn.py), so
                         #   compute never gathers by eid — it exists for
                         #   import/export/parity against reference numbering.
    norm: jax.Array      # float32 (E_pad,) — precomputed degree norm; 0 on padding
    indptr: jax.Array    # int32 (N + 1,) — CSR row pointers over dst
    sperm: jax.Array     # int32 (E_pad,) — permutation making src sorted
    s_indptr: jax.Array  # int32 (N + 1,) — CSR row pointers over src[sperm]
    s_src: jax.Array     # int32 (E_pad,) — src[sperm], precomputed (a 1-D int
                         #   gather is surprisingly expensive on TPU: ~0.6 ms
                         #   per half per step when done inside the backward)
    s_dst: jax.Array     # int32 (E_pad,) — dst[sperm]; with s_norm/s_rel these
    s_norm: jax.Array    # f32 (E_pad,)  — let the backward compose its
    s_rel: jax.Array     # int32 (E_pad,) — src-sorted cotangent stream from
                         #   SMALL-source gathers instead of permuting the
                         #   (E, d) contrib array (bwd_perm='operands')
    rperm: jax.Array     # int32 (E_pad,) — permutation sorting rel: the
    r_indptr: jax.Array  # int32 (2R + 2,) — relation-gradient segment-sum
    r_rel: jax.Array     # int32 (E_pad,) — rel[rperm]; runs through the same
                         #   Pallas kernel when the relation vocabulary is too
                         #   large for a one-hot matmul (FB15k-scale)
    e_real: int = _static(default=0)     # unpadded edge count


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GraphStacked:
    """Both direction halves as ONE edge list (the hot-path view).

    The out-half's destination ids are offset by ``n_ent``, so the segment id
    space is ``[0, 2N)`` and the concatenation [in-half (dst-sorted); out-half
    (dst-sorted)] is globally dst-sorted.  One gather, one compose, one kernel
    launch then produce BOTH directions' aggregations as rows ``[0:N]`` and
    ``[N:2N]`` of a single segment-sum — half the op count of per-half calls.
    Position k indexes row k of the positionally-stored edge-embedding table
    (models/mgcn.py), i.e. the whole table is consumed as one contiguous
    (2*E_pad, d) slice.
    """

    src: jax.Array       # int32 (2*E_pad,) — source entity ids (both halves)
    dst2: jax.Array      # int32 (2*E_pad,) — dst + n_ent*is_out_half; sorted
    rel: jax.Array       # int32 (2*E_pad,) — relation ids (out half: rel + R)
    norm: jax.Array      # float32 (2*E_pad,) — degree norms; 0 on padding
    indptr: jax.Array    # int32 (2N + 1,) — CSR pointers over dst2
    sperm: jax.Array     # int32 (2*E_pad,) — permutation sorting src (both
                         #   halves together: d_x sums over src globally)
    s_indptr: jax.Array  # int32 (N + 1,) — CSR pointers over src[sperm]
    s_src: jax.Array     # int32 (2*E_pad,) — src[sperm], precomputed
    rperm: jax.Array     # int32 (2*E_pad,) — rel-sorted permutation (d_rel)
    r_indptr: jax.Array  # int32 (2R + 2,)
    r_rel: jax.Array     # int32 (2*E_pad,) — rel[rperm]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Graph:
    inb: GraphHalf       # original orientation (src, rel, dst)
    outb: GraphHalf      # reversed orientation (dst, rel + R, src)
    stacked: GraphStacked  # both halves as one dst-sorted edge list
    n_ent: int = _static(default=0)
    n_rel: int = _static(default=0)   # R; relation tables hold 2R (+1 loop)
    n_edge: int = _static(default=0)  # E = true (unpadded) edges per half
    e_pad: int = _static(default=0)   # padded edge count per half

    @property
    def num_messages(self) -> int:
        """Edges aggregated per forward pass (both halves + N self-loops)."""
        return 2 * self.n_edge + self.n_ent


from kgc_gcn_tpu.tiling import TILE_E as _TILE_E

EDGE_PAD = max(256, _TILE_E)   # default edge-count padding; a multiple of the
                               # Pallas TILE_E so kernel inputs need no runtime
                               # re-padding of the (E, 128) message arrays


def padded_edge_count(n_edge: int, pad_to: int = EDGE_PAD) -> int:
    """Padded per-half edge count for a given real edge count (static)."""
    return max(pad_to, -(-n_edge // pad_to) * pad_to)


def _reference_norm(row: np.ndarray, col: np.ndarray, n_ent: int) -> np.ndarray:
    """deg^-1/2[row] * deg^-1/2[col], degree over row occurrences only
    (reference model.py:72-80)."""
    deg = np.zeros(n_ent, dtype=np.float32)
    np.add.at(deg, row, 1.0)
    with np.errstate(divide="ignore"):
        dinv = deg ** -0.5
    dinv[np.isinf(dinv)] = 0.0
    return (dinv[row] * dinv[col]).astype(np.float32)


def _rel_sort(rel: np.ndarray, n_rel_rows: int):
    rperm = np.argsort(rel, kind="stable").astype(np.int32)
    r_indptr = np.zeros(n_rel_rows + 1, np.int32)
    r_indptr[1:] = np.cumsum(np.bincount(rel, minlength=n_rel_rows))
    return rperm, r_indptr, rel[rperm].astype(np.int32)


def _build_half(src, dst, rel, eid, n_ent: int, n_edge_total: int,
                n_rel_rows: int, pad_to: int,
                use_native: bool = True) -> GraphHalf:
    e = len(src)
    nat = None
    if use_native:
        # C++ half-builder (native/graphcore.cpp gc_build_half): one pass for
        # the stable dst-sort + CSR pointers + reference norm — the numpy
        # norm path's np.add.at is the host-side bottleneck on large graphs.
        # Equality vs numpy is pinned by tests/test_native.py.
        from kgc_gcn_tpu.utils.native import build_half_native
        nat = build_half_native(src, dst, n_ent)
    if nat is not None:
        order, _, norm = nat
    else:
        norm = _reference_norm(src, dst, n_ent)
        order = np.argsort(dst, kind="stable")
    src, dst, rel, eid, norm = (a[order] for a in (src, dst, rel, eid, norm))

    e_pad = padded_edge_count(e, pad_to)
    pad = e_pad - e
    if pad:
        # zero-norm padding: contributes nothing to the segment sum.  Padding
        # eid is the sentinel 2E — compute never gathers by eid (the per-edge
        # table is stored positionally, models/mgcn.py); the sentinel just
        # keeps eid values duplicate-free for the import/export mappings
        # (edge_table_{to,from}_reference_order skip rows >= e_real anyway)
        src = np.concatenate([src, np.zeros(pad, src.dtype)])
        dst = np.concatenate([dst, np.full(pad, n_ent - 1, dst.dtype)])
        rel = np.concatenate([rel, np.zeros(pad, rel.dtype)])
        eid = np.concatenate([eid, np.full(pad, n_edge_total, eid.dtype)])
        norm = np.concatenate([norm, np.zeros(pad, norm.dtype)])

    def csr_pointers(idx):
        ptr = np.zeros(n_ent + 1, dtype=np.int32)
        ptr[1:] = np.cumsum(np.bincount(idx, minlength=n_ent))
        return ptr

    indptr = csr_pointers(dst)           # padding lands in row n_ent - 1
    sperm = np.argsort(src, kind="stable").astype(np.int32)
    s_indptr = csr_pointers(src)         # padding (src=0) lands in row 0
    rperm, r_indptr, r_rel = _rel_sort(rel, n_rel_rows)

    return GraphHalf(
        src=jnp.asarray(src, jnp.int32),
        dst=jnp.asarray(dst, jnp.int32),
        rel=jnp.asarray(rel, jnp.int32),
        eid=jnp.asarray(eid, jnp.int32),
        norm=jnp.asarray(norm, jnp.float32),
        indptr=jnp.asarray(indptr, jnp.int32),
        sperm=jnp.asarray(sperm, jnp.int32),
        s_indptr=jnp.asarray(s_indptr, jnp.int32),
        s_src=jnp.asarray(src[sperm], jnp.int32),
        s_dst=jnp.asarray(dst[sperm], jnp.int32),
        s_norm=jnp.asarray(norm[sperm], jnp.float32),
        s_rel=jnp.asarray(rel[sperm], jnp.int32),
        rperm=jnp.asarray(rperm),
        r_indptr=jnp.asarray(r_indptr),
        r_rel=jnp.asarray(r_rel),
        e_real=e,
    )


def edge_table_to_reference_order(edge_tab: np.ndarray, graph: Graph) -> np.ndarray:
    """Map a positionally-stored per-edge embedding table to reference
    numbering (``(2E, d)``, row i = reference edge id i; data_loader.py:148).

    The model stores the table as ``[in-half rows (dst order); out-half rows
    (dst order)]`` with padding rows interleaved at the end of each half
    (models/mgcn.py); ``half.eid`` records each position's reference id.
    """
    tab = np.asarray(edge_tab)
    e_pad = graph.e_pad
    tab = tab.reshape(2 * e_pad, tab.shape[-1])   # accepts (2, E_pad, d) too
    out = np.zeros((2 * graph.n_edge, tab.shape[1]), tab.dtype)
    for half, base in ((graph.inb, 0), (graph.outb, e_pad)):
        eid = np.asarray(half.eid)[: half.e_real]
        out[eid] = tab[base: base + half.e_real]
    return out


def edge_table_from_reference_order(ref_tab: np.ndarray, graph: Graph) -> np.ndarray:
    """Inverse of :func:`edge_table_to_reference_order` (padding rows zero).

    Returns the model's ``(2, E_pad, d)`` layout (models/mgcn.py)."""
    ref_tab = np.asarray(ref_tab)
    e_pad = graph.e_pad
    out = np.zeros((2 * e_pad, ref_tab.shape[1]), ref_tab.dtype)
    for half, base in ((graph.inb, 0), (graph.outb, e_pad)):
        eid = np.asarray(half.eid)[: half.e_real]
        out[base: base + half.e_real] = ref_tab[eid]
    return out.reshape(2, e_pad, ref_tab.shape[1])


def build_graph(
    train_triples: np.ndarray,
    n_ent: int,
    n_rel: int,
    pad_to: int = EDGE_PAD,
    use_native: bool = True,
) -> Graph:
    """Build the bidirectional training graph (reference data_loader.py:132-157).

    Edge ids: forward edge i gets id ``i``, its reverse gets ``E + i`` —
    matching the reference's ``arange(2E)`` over the concatenated list
    (data_loader.py:148).
    """
    tri = np.asarray(train_triples)
    src, rel, dst = tri[:, 0].astype(np.int32), tri[:, 1].astype(np.int32), tri[:, 2].astype(np.int32)
    e = len(src)
    eid = np.arange(e, dtype=np.int32)

    n_rel_rows = 2 * n_rel + 1   # rel_all rows incl. the appended loop rel
    inb = _build_half(src, dst, rel, eid, n_ent, 2 * e, n_rel_rows, pad_to,
                      use_native)
    outb = _build_half(dst, src, rel + n_rel, eid + e, n_ent, 2 * e,
                       n_rel_rows, pad_to, use_native)
    e_pad = int(inb.src.shape[0])

    # stacked view: concat the (already dst-sorted) halves, offsetting the
    # out-half's dst by N — the result is globally sorted over [0, 2N)
    s_src = np.concatenate([np.asarray(inb.src), np.asarray(outb.src)])
    s_dst2 = np.concatenate([np.asarray(inb.dst),
                             np.asarray(outb.dst) + n_ent]).astype(np.int32)
    s_rel = np.concatenate([np.asarray(inb.rel), np.asarray(outb.rel)])
    s_norm = np.concatenate([np.asarray(inb.norm), np.asarray(outb.norm)])
    indptr2 = np.zeros(2 * n_ent + 1, np.int32)
    indptr2[1:] = np.cumsum(np.bincount(s_dst2, minlength=2 * n_ent))
    sp = np.argsort(s_src, kind="stable").astype(np.int32)
    sip = np.zeros(n_ent + 1, np.int32)
    sip[1:] = np.cumsum(np.bincount(s_src, minlength=n_ent))
    rp, rip, rr = _rel_sort(s_rel, n_rel_rows)
    stacked = GraphStacked(
        src=jnp.asarray(s_src), dst2=jnp.asarray(s_dst2),
        rel=jnp.asarray(s_rel), norm=jnp.asarray(s_norm),
        indptr=jnp.asarray(indptr2), sperm=jnp.asarray(sp),
        s_indptr=jnp.asarray(sip), s_src=jnp.asarray(s_src[sp]),
        rperm=jnp.asarray(rp), r_indptr=jnp.asarray(rip),
        r_rel=jnp.asarray(rr))

    return Graph(inb=inb, outb=outb, stacked=stacked, n_ent=n_ent,
                 n_rel=n_rel, n_edge=e, e_pad=e_pad)
