"""Fused Pallas TPU kernel: CSR segment-sum via blocked one-hot MXU matmuls.

The hot op of the whole framework is the edge->node aggregation (the
reference runs it through torch-scatter's CUDA ``scatter_add``, model.py:99-101
via PyG propagate).  XLA:TPU lowers ``segment_sum`` to a scatter, which the
TPU executes mostly serially.  This kernel instead turns the aggregation into
dense MXU work:

  * edges are CSR-sorted by destination (data/graph.py), so each tile of
    ``TILE_N`` destination rows owns a contiguous edge range;
  * the kernel walks that range in ``TILE_E``-edge chunks, DMAing the
    ``(TILE_E, D)`` message block and the ``(TILE_E, 1)`` destination ids from
    HBM into VMEM;
  * a chunk's contribution is ``onehot(dst)ᵀ @ msg`` — a
    ``(TILE_N, TILE_E) x (TILE_E, D)`` matmul on the MXU, where the one-hot is
    built on the fly with a broadcast compare.  Rows outside the tile mask
    themselves (their compare is all-zero), so no scalar bookkeeping is
    needed beyond the chunk's global edge-index bounds.

Per-tile edge ranges come from ``indptr`` sampled at tile boundaries and are
scalar-prefetched (pltpu.PrefetchScalarGridSpec) so the kernel can compute DMA
offsets before the body runs.

The backward of a segment-sum is a plain gather (``g[dst]``), wired up with
``jax.custom_vjp``; the gradient scatter into ``x[src]`` that autodiff then
needs is itself a segment-sum over SOURCE-sorted edges, which reuses this same
kernel through the precomputed ``sperm``/``s_indptr``/``s_src``; the relation
gradient is a one-hot MXU matmul and the edge-embedding gradient is the dense
per-edge product itself (the table is stored in edge order — models/mgcn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgc_gcn_tpu.data.graph import GraphHalf

import os

from kgc_gcn_tpu.tiling import TILE_E, TILE_N
ONEHOT_LIMIT = int(os.environ.get("KGC_ONEHOT_LIMIT", 256 * 1024 * 1024))
#   max relation one-hot element count (bf16 bytes = 2x this); above it,
#   relation one-hot matmuls fall back to the rel-sorted kernel / row-gather
#   paths.  Raised 64M -> 256M 2026-08-18: at FB15k scale (E2=272k x R'=476 =
#   130M) the one-hot matmul replaces a 2.7 ms large-source permutation
#   gather + pad + kernel with ~1 ms of MXU work per half (see BENCH_NOTES).
BF16_CAST = os.environ.get("KGC_BF16_CAST", "pre")
#   when/where bf16 message modes cast the backward's contrib stream:
#   'pre' casts before the s-perm gather (half the permuted bytes), 'post'
#   after it (keeps the gather fused where bf16 convert+gather unfuses into
#   a layout copy — the stacked_xla bf16 FB15k regression, BENCH_NOTES r3;
#   measured no fix either way there, kept as a documented knob)
BASIS_TILE_N = int(os.environ.get("KGC_BASIS_TILE_N", 128))
BASIS_TILE_E = int(os.environ.get("KGC_BASIS_TILE_E", 256))
BASIS_FWD_TILE_N = int(os.environ.get("KGC_BASIS_FWD_TILE_N", 0))
#   >0 pins the basis FORWARD kernel's dst-row tile (otherwise derived from
#   TILE_N under a 1 MiB out-block cap).  The out block is
#   (tile_n, B*d_pad) f32 VMEM — at B=30/d_pad=128, tile_n=128 is ~2 MiB.
BASIS_PAD = os.environ.get("KGC_BASIS_PAD", "through")
#   lane-padding placement for the basis kernels (d=100 -> d_pad=128):
#   'through' — DEFAULT since round 5 (22.8 -> 24.2 steps/s end-to-end at
#               FB15k config 3, one-session A/B): pad the SMALL tables
#               (x, coeff, basis rows) and keep d_pad through the whole
#               layer — gathers produce padded operands directly, the
#               einsum contracts zero basis rows (exactly inert), and the
#               backward cotangent arrives 128-wide with no pad
#   'slice'   — pad the big (E,*) streams at the kernel boundary and slice
#               the (N, B, d_pad) output back to d (the round-4 layout;
#               cost ~7 ms/step of pad/slice copies — round-5 trace: g pad
#               3.95, operand pads 1.7, slice 1.35)
EDGE_CONTRIB = os.environ.get("KGC_EDGE_CONTRIB", "f32")
#   edge_compose backward's d_h contrib stream ('bf16' halves the (E, d)
#   permutation bytes, f32 kernel accumulation — the RGCN readback trick
#   applied to RGAT; opt-in, A/B via ab_variants edge_contrib:)
MGCN_CONTRIB = os.environ.get("KGC_MGCN_CONTRIB", "f32")
#   the MGCN f32 backward's contrib[sperm] stream, same trick ('bf16'
#   casts the composed contrib before the s-perm gather while the rest of
#   the step stays f32; d_x accumulates f32 in the kernel) — opt-in,
#   A/B via ab_variants mgcn_contrib:
BASIS_READBACK = os.environ.get("KGC_BASIS_READBACK", "wide")
#   the backward's s<->d readback permutation (6.8 ms/step of the 45.7 at
#   FB15k config 3 — round-5 profile): 'wide' gathers the (E_pad2, 128)
#   padded rows then slices to d; 'narrow' slices to d FIRST and gathers
#   d-wide (row gathers from a 128-lane array measured 2.3x slower than
#   from a native-width one — BENCH_NOTES lore #5)
BASIS_FWD_VARIANT = os.environ.get("KGC_BASIS_FWD_VARIANT", "loop")
#   basis FORWARD kernel inner schedule: 'loop' = per-b expansion + 2 MXU
#   row-select matmuls per basis (round 4); 'v3d' = ONE (tile_e, B*d_pad)
#   3D expansion + ONE hi/lo matmul pair for the whole out block (no
#   30-iteration VPU loop) — round-5 candidate, numerics-equivalent
BASIS_BWD_VARIANT = os.environ.get("KGC_BASIS_BWD_VARIANT", "da_matmul")
#   band backward kernel inner-schedule variants (round-5 attribution +
#   ladder; A/B via ab_variants basis_bwd_variant:):
#   'da_matmul' — DEFAULT since round 5: d_a via ONE hi/lo MXU matmul
#                 against the 0/1 block indicator (replaces 30 width-1
#                 sublane stores + 30 lane reductions per chunk); with
#                 BASIS_TILE_N=128 measured 16.0 vs 18.1 ms band-only and
#                 21.8 -> 22.9 steps/s end-to-end at FB15k config 3
#   'full'      — per-b VPU acc loop for d_msg + per-b lane-reduce with
#                 width-1 column stores for d_a (the round-4 schedule)
#   'v3d'/'tree'/'tree_da_matmul'/'aexp_da_matmul' — measured NEGATIVE
#                 (BENCH_NOTES round-5 ladder); kept for re-measurement
#   'no_da' / 'no_dmsg' / 'dma_only' — TIMING-ONLY attribution variants
#                 (skip that piece; outputs wrong) — never use in training
#   dst-row-tile / edge-chunk sizes of the basis BACKWARD band kernel
#   (build_basis_bwd_plan defaults; swept round 5 — see BENCH_NOTES).
#   VMEM budget: g scratch is 3 copies of (tile_n, B*d_pad) (f32+2xbf16,
#   ~tile_n*30 KiB at B=30/d_pad=128) and the in-kernel `sel` intermediate
#   is (tile_e, B*d_pad) f32 (~tile_e*15 KiB) — keep their sum well under
#   the 16 MiB scoped VMEM.
SPERM_BARRIER = os.environ.get("KGC_SPERM_BARRIER", "0") == "1"
#   scheduling experiment (round-2 open lever): the backward's contrib[sperm]
#   gather measures 2.7 ms IN CONTEXT at FB15k scale vs 0.82 ms isolated
#   (gather_micro.py) — hypothesis was scheduling/memory pressure around the
#   Pallas custom calls.  '1' fences the gather with optimization_barrier on
#   both sides, forcing XLA to schedule it as an isolated region; A/B via
#   ab_variants sperm_barrier:1.


def _seg_kernel(bounds_ref, msg_hbm, dst_hbm, out_ref,
                msg_vmem, dst_vmem, sems, *, tile_n, tile_e):
    """One program owns ``tile_n`` destination rows.

    Chunk starts are aligned DOWN to ``tile_e`` so every DMA offset is
    lane-aligned; edges read before ``start`` or after ``end`` have a dst
    outside this tile's rows (CSR order) and self-mask in the compare — no
    explicit masking needed.  ``dst`` arrives as a (1, E) row vector so the
    transposed one-hot (rows x edges) is built directly, feeding the MXU
    without a transpose.
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    row0 = t * tile_n
    a0 = pl.multiple_of((start // tile_e) * tile_e, tile_e)

    out_ref[:] = jnp.zeros_like(out_ref)
    n_chunks = pl.cdiv(end - a0, tile_e)

    def dmas(slot, ci):
        e0 = pl.multiple_of(a0 + ci * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                msg_hbm.at[pl.ds(e0, tile_e), :], msg_vmem.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(e0, tile_e)], dst_vmem.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        # prefetch the next chunk while this one computes (double buffering)
        @pl.when(ci + 1 < n_chunks)
        def _():
            for cp in dmas(1 - slot, ci + 1):
                cp.start()

        for cp in dmas(slot, ci):
            cp.wait()

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_e), 0) + row0
        dn = (((1,), (0,)), ((), ()))
        m = msg_vmem[slot]
        d_ids = dst_vmem[slot]
        if msg_vmem.dtype == jnp.float32:
            # near-f32 accuracy (~2^-17 relative per element) in 2 MXU
            # passes: the one-hot is exact in bf16, so split msg into hi/lo
            # bf16 halves (the default MXU precision would round msg to bf16
            # outright; HIGHEST would cost 9 passes)
            onehot_t = (rows == d_ids).astype(jnp.bfloat16)
            hi = m.astype(jnp.bfloat16)
            lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[:] += (
                jax.lax.dot_general(onehot_t, hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot_t, lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))
        else:
            onehot_t = (rows == d_ids).astype(msg_vmem.dtype)
            out_ref[:] += jax.lax.dot_general(
                onehot_t, m, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def segment_sum_pallas(msg: jax.Array, dst: jax.Array, indptr: jax.Array,
                       n_rows: int, interpret: bool = False) -> jax.Array:
    """Sorted-COO segment-sum: (E, D) messages + non-decreasing (E,) dst ->
    (n_rows, D).  Rows with no edges get zeros.  ``indptr`` is the (n_rows+1,)
    CSR pointer array of ``dst``."""
    e_orig, d_orig = msg.shape
    # Mosaic DMA slices must be lane-aligned: pad the feature dim to 128 and
    # the edge dim to a multiple of tile_e (pad dst with a never-matching id)
    d = -(-d_orig // 128) * 128
    # WIDE messages (e.g. RGCN's (E, B*d_in) basis expansion, 3072 lanes at
    # FB15k config 3) blow the 16 MiB scoped-VMEM budget at the default
    # tiles: shrink until double-buffered inputs stay under ~4 MiB and the
    # output block under ~2 MiB — the hi/lo bf16 splits and MXU partial
    # results are stack intermediates that scale with tile_n*d on top of
    # the declared scratch (measured: 12 MiB of declared buffers OOM'd at
    # 16.28M actual)
    tile_e = TILE_E
    while tile_e > 128 and 2 * tile_e * d * 4 > 4 * 2**20:
        tile_e //= 2
    tile_n = TILE_N
    while tile_n > 64 and tile_n * d * 4 > 2 * 2**20:
        tile_n //= 2
    e_total = -(-e_orig // tile_e) * tile_e
    if d != d_orig or e_total != e_orig:
        msg = jnp.pad(msg, ((0, e_total - e_orig), (0, d - d_orig)))
        dst = jnp.pad(dst, (0, e_total - e_orig),
                      constant_values=np.int32(2**30))
    n_tiles = -(-n_rows // tile_n)
    n_pad = n_tiles * tile_n

    # per-tile edge bounds from indptr at tile boundaries
    tile_rows = jnp.minimum(np.arange(n_tiles + 1) * tile_n, n_rows)
    bounds = indptr[tile_rows].astype(jnp.int32)

    kernel = functools.partial(_seg_kernel, tile_n=tile_n, tile_e=tile_e)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # msg stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),   # dst stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (tile_n, d), lambda t, bounds: (t, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tile_e, d), msg.dtype),
                pltpu.VMEM((2, 1, tile_e), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, msg, dst.reshape(1, -1))
    return out[:n_rows, :d_orig]


# ---------------------------------------------- fused compose+aggregate kernel

def _fused_kernel(bounds_ref, rel_hi_ref, rel_lo_ref,
                  xgn_hbm, etab_hbm, rid_hbm, dst_hbm, out_ref,
                  xg_vmem, et_vmem, rid_vmem, dst_vmem, sems,
                  *, tile_n, tile_e):
    """Segment-sum of ``xgn * rel_all[rid] * etab`` over dst tiles.

    Composition happens IN VMEM: per chunk the kernel DMAs the (norm-folded)
    gathered source rows and the contiguous edge-embedding rows, builds the
    relation rows with a one-hot MXU matmul against the VMEM-resident relation
    table (hi/lo bf16 split for exact f32), multiplies elementwise, and
    accumulates through the dst one-hot matmul.  This kills the XLA-side
    (E, 128) message materialization (relation gather + two multiply passes +
    re-pad) that a precomposed-message kernel needs.
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    row0 = t * tile_n
    a0 = pl.multiple_of((start // tile_e) * tile_e, tile_e)

    out_ref[:] = jnp.zeros_like(out_ref)
    n_chunks = pl.cdiv(end - a0, tile_e)

    def dmas(slot, ci):
        e0 = pl.multiple_of(a0 + ci * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                xgn_hbm.at[pl.ds(e0, tile_e), :], xg_vmem.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                etab_hbm.at[pl.ds(e0, tile_e), :], et_vmem.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                rid_hbm.at[:, pl.ds(e0, tile_e)], rid_vmem.at[slot],
                sems.at[slot, 2]),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(e0, tile_e)], dst_vmem.at[slot],
                sems.at[slot, 3]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            for cp in dmas(1 - slot, ci + 1):
                cp.start()

        for cp in dmas(slot, ci):
            cp.wait()

        n_rel_pad = rel_hi_ref.shape[0]
        dn_rel = (((0,), (0,)), ((), ()))    # (R', E_t) x (R', D) -> (E_t, D)
        rel_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_rel_pad, tile_e), 0)
        rel_onehot_t = (rel_iota == rid_vmem[slot]).astype(jnp.bfloat16)
        rel_rows = (
            jax.lax.dot_general(rel_onehot_t, rel_hi_ref[:],
                                dimension_numbers=dn_rel,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(rel_onehot_t, rel_lo_ref[:],
                                  dimension_numbers=dn_rel,
                                  preferred_element_type=jnp.float32))

        m = xg_vmem[slot] * rel_rows * et_vmem[slot]

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_e), 0) + row0
        dn = (((1,), (0,)), ((), ()))
        onehot_t = (rows == dst_vmem[slot]).astype(jnp.bfloat16)
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += (
            jax.lax.dot_general(onehot_t, hi, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(onehot_t, lo, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _fused_compose_segment_sum(xgn, etab, rid, dst, rel_hi, rel_lo, indptr,
                               n_rows: int, interpret: bool = False):
    """(E, 128) norm-folded source rows + (E, 128) edge rows + rel ids ->
    (n_rows, 128) segment-sum of composed messages (dst non-decreasing)."""
    e, d = xgn.shape
    assert d % 128 == 0, d
    e_al = -(-e // TILE_E) * TILE_E
    if e_al != e:   # tiny test graphs; production edge counts are pre-aligned
        pad = e_al - e
        xgn = jnp.pad(xgn, ((0, pad), (0, 0)))
        etab = jnp.pad(etab, ((0, pad), (0, 0)))
        rid = jnp.pad(rid, (0, pad))
        dst = jnp.pad(dst, (0, pad), constant_values=np.int32(2**30))
    n_tiles = -(-n_rows // TILE_N)

    tile_rows = jnp.minimum(np.arange(n_tiles + 1) * TILE_N, n_rows)
    bounds = indptr[tile_rows].astype(jnp.int32)

    kernel = functools.partial(_fused_kernel, tile_n=TILE_N, tile_e=TILE_E)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_hi (R'pad, D)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_lo (R'pad, D)
                pl.BlockSpec(memory_space=pl.ANY),       # xgn in HBM
                pl.BlockSpec(memory_space=pl.ANY),       # etab in HBM
                pl.BlockSpec(memory_space=pl.ANY),       # rel ids (1, E)
                pl.BlockSpec(memory_space=pl.ANY),       # dst (1, E)
            ],
            out_specs=pl.BlockSpec(
                (TILE_N, d), lambda t, bounds: (t, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TILE_E, d), xgn.dtype),
                pltpu.VMEM((2, TILE_E, d), etab.dtype),
                pltpu.VMEM((2, 1, TILE_E), jnp.int32),
                pltpu.VMEM((2, 1, TILE_E), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_N, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, rel_hi, rel_lo, xgn, etab,
      rid.reshape(1, -1), dst.reshape(1, -1))


def rel_rows_onehot(rel_all: jax.Array, rel: jax.Array) -> jax.Array:
    """Materialize per-edge relation rows ``rel_all[rel]`` as a one-hot MXU
    matmul instead of a row gather.

    With a small relation vocabulary the gather is NOT cheap: XLA lowers it to
    a kCustom gather writing the (E, d) output at ~220 GB/s effective
    (traced at 0.158 ms per half per step at WN18RR scale — as expensive as
    gathering from the 40943-row entity table).  ``onehot(rel) @ rel_all`` is
    write-bandwidth-bound MXU work instead.  The one-hot is exact in bf16 and
    each output row is a single-term sum, so the hi/lo bf16 split reproduces
    f32 rows to ~2^-17 relative (hi carries 8 mantissa bits, lo another 8 of
    the residual — NOT full f32; the parity tests bound the end-to-end effect).
    Falls back to the gather for large vocabularies (FB15k-scale).
    """
    n_rel = rel_all.shape[0]
    if n_rel * rel.shape[0] > ONEHOT_LIMIT:
        return rel_all[rel]
    onehot = (rel[:, None] == jnp.arange(n_rel, dtype=rel.dtype)[None, :]
              ).astype(jnp.bfloat16)                    # (E, R')
    hi = rel_all.astype(jnp.bfloat16)
    lo = (rel_all - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.matmul(onehot, hi, preferred_element_type=jnp.float32)
            + jnp.matmul(onehot, lo, preferred_element_type=jnp.float32))


def _pad_rows(a, mult):
    r = a.shape[0]
    rp = -(-r // mult) * mult
    return a if rp == r else jnp.pad(a, ((0, rp - r), (0, 0)))


def _pad_cols(a, mult=128):
    c = a.shape[1]
    cp = -(-c // mult) * mult
    return a if cp == c else jnp.pad(a, ((0, 0), (0, cp - c)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _aggregate_stacked_cvjp(x, rel_all, etab, src, dst2, rel, norm,
                            indptr2, sdata, n_ent, interpret):
    """Both-halves aggregation: returns (2N, 128) — rows [0:N] in, [N:2N] out.

    ``etab`` is the WHOLE positionally-stored table (2*E_pad, d), lane-padded
    to 128 internally; ``sdata = (sperm, s_indptr, s_src, rperm, r_indptr,
    r_rel)`` drives the src-sorted / rel-sorted backward passes.
    """
    del sdata
    # gather at the NATIVE lane width then pad: a row gather from a 128-lane
    # array is ~2.3x slower than from a 100-lane one on this TPU (measured),
    # and XLA fuses the norm multiply + pad into the gather consumer
    xgn = _pad_cols(x[src] * norm[:, None])
    et128 = _pad_cols(etab)
    rel128 = _pad_rows(_pad_cols(rel_all), 8)
    rel_hi = rel128.astype(jnp.bfloat16)
    rel_lo = (rel128 - rel_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return _fused_compose_segment_sum(
        xgn, et128, rel, dst2, rel_hi, rel_lo, indptr2, 2 * n_ent,
        interpret=interpret)[: 2 * n_ent]


def _agg_stacked_fwd(x, rel_all, etab, src, dst2, rel, norm,
                     indptr2, sdata, n_ent, interpret):
    xgn = _pad_cols(x[src] * norm[:, None])
    et128 = _pad_cols(etab)
    rel128 = _pad_rows(_pad_cols(rel_all), 8)
    rel_hi = rel128.astype(jnp.bfloat16)
    rel_lo = (rel128 - rel_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = _fused_compose_segment_sum(
        xgn, et128, rel, dst2, rel_hi, rel_lo, indptr2, 2 * n_ent,
        interpret=interpret)[: 2 * n_ent]
    return out, (x, rel_all, et128, xgn, src, dst2, rel, norm, sdata)


def _agg_stacked_bwd(n_ent, interpret, res, g):
    x, rel_all, etab, xgn, src, dst2, rel, norm, sdata = res
    sperm, s_indptr, s_src, rperm, r_indptr, r_rel = sdata
    d = x.shape[1]                   # etab here is the 128-padded copy
    n_rel = rel_all.shape[0]

    g128 = _pad_cols(g)                       # (2N, 128); pad cols are zero
    gdst = g128[dst2]                         # (E2, 128) cotangent rows
    gdn = gdst * norm[:, None]
    gx = gdst * xgn                           # = gd * x[src] (norm folded once)

    # relation rows, materialized once for the backward (the forward never
    # stores them): one-hot MXU matmul when the one-hot fits, row gather for
    # large relation vocabularies (FB15k-scale)
    rel128 = _pad_rows(_pad_cols(rel_all), 8)
    if rel128.shape[0] * rel.shape[0] <= ONEHOT_LIMIT:
        onehot_t = (rel[None, :] == jnp.arange(rel128.shape[0],
                                               dtype=rel.dtype)[:, None]
                    ).astype(jnp.bfloat16)    # (R'pad, E2)
        dn = (((0,), (0,)), ((), ()))
        rel_hi = rel128.astype(jnp.bfloat16)
        rel_lo = (rel128 - rel_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rel_rows = (jax.lax.dot_general(
                        onehot_t, rel_hi, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        onehot_t, rel_lo, dimension_numbers=dn,
                        preferred_element_type=jnp.float32))
    else:
        rel_rows = rel128[rel]

    # d_x: segment-sum over src of gd * rel_rows * etab (src-sorted kernel)
    contrib = gdn * rel_rows * etab
    dx = segment_sum_pallas(
        contrib[sperm], s_src, s_indptr, x.shape[0],
        interpret=interpret)[:, :d]

    # d_rel: one-hot MXU matmul of gd * x[src] * etab over relation ids
    d_rel = _segment_sum_few(gx * etab, rel, n_rel,
                             rdata=(rperm, r_indptr, r_rel),
                             interpret=interpret)[:, :d]

    # d_etab: dense per-edge product (positional layout: scatter-free)
    d_etab = (gx * rel_rows)[:, :d]

    return (dx, d_rel, d_etab) + (None,) * 6


_aggregate_stacked_cvjp.defvjp(_agg_stacked_fwd, _agg_stacked_bwd)


def aggregate_stacked_pallas(x, rel_all, etab, stacked, n_ent: int,
                             interpret: bool = False):
    """Fused both-halves aggregation over the stacked graph view.

    Returns ``(in_agg, out_agg)`` — each ``(N, 128)`` f32 with zero padding
    columns beyond ``x.shape[1]`` (project with row-padded weights, or slice).
    One XLA gather + one Pallas launch cover BOTH direction halves; the whole
    edge-embedding table is consumed positionally with no gather (see
    data/graph.py ``GraphStacked`` and models/mgcn.py for the layouts).
    """
    out = _aggregate_stacked_cvjp(
        x, rel_all, etab, stacked.src, stacked.dst2, stacked.rel,
        stacked.norm, stacked.indptr,
        (stacked.sperm, stacked.s_indptr, stacked.s_src,
         stacked.rperm, stacked.r_indptr, stacked.r_rel),
        n_ent, interpret)
    return out[:n_ent], out[n_ent:]


# ------------------------------------------------------- aggregation with VJP

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(13, 14, 15, 16, 17, 18))
def _aggregate_cvjp(x, rel_all, etab, src, dst, rel, norm,
                    indptr, sperm, s_indptr, s_src, rdata, sdata,
                    n_ent, interpret, msg_dtype="float32",
                    rel_onehot=False, ew_pallas=False, bwd_perm="contrib"):
    from kgc_gcn_tpu.ops.elementwise_pallas import _pick_tile, compose_msg_pad
    rg = rel_rows_onehot(rel_all, rel) if rel_onehot else rel_all[rel]
    if ew_pallas and _pick_tile(src.shape[0]) and not interpret:
        # single-pass compose emitting the lane-padded message directly (XLA
        # lowers compose and the 100->128 pad as two passes: 0.39 + 0.27 ms/
        # step traced at WN18RR scale)
        d = x.shape[1]
        xgn = x[src] * norm[:, None]
        msg = compose_msg_pad(xgn, rg, etab, -(-d // 128) * 128, msg_dtype,
                              interpret)
        return segment_sum_pallas(
            msg, dst, indptr, n_ent, interpret=interpret)[:, :d]
    else:
        msg = (x[src] * rg * etab) * norm[:, None]
        if msg_dtype != "float32":
            # bf16 message mode (compute_dtype=bfloat16): halves the kernel's
            # HBM traffic and single-passes the MXU (no hi/lo split);
            # accumulation stays f32 inside the kernel — same precision model
            # as bf16 matmuls
            msg = msg.astype(msg_dtype)
    return segment_sum_pallas(msg, dst, indptr, n_ent, interpret=interpret)


def _agg_fwd(x, rel_all, etab, src, dst, rel, norm,
             indptr, sperm, s_indptr, s_src, rdata, sdata,
             n_ent, interpret, msg_dtype="float32",
             rel_onehot=False, ew_pallas=False, bwd_perm="contrib"):
    out = _aggregate_cvjp(x, rel_all, etab, src, dst, rel, norm,
                          indptr, sperm, s_indptr, s_src, rdata, sdata,
                          n_ent, interpret, msg_dtype, rel_onehot, ew_pallas,
                          bwd_perm)
    w_s = None
    if bwd_perm == "fwdw":
        # hoist the irreducible (E, d) permutation into the FORWARD: permute
        # the cotangent-independent factor w = rel_rows * etab once and save
        # it src-sorted, so the backward composes contrib_s from small-source
        # gathers only (scheduling experiment — see _agg_bwd)
        s_rel = sdata[2]
        rg_s = rel_rows_onehot(rel_all, s_rel) if rel_onehot \
            else rel_all[s_rel]
        w_s = rg_s * etab[sperm]
    return out, (x, rel_all, etab, src, dst, rel, norm,
                 sperm, s_indptr, s_src, rdata, sdata, w_s)


def _segment_sum_few(vals: jax.Array, ids: jax.Array, n_seg: int,
                     rdata=None, interpret: bool = False) -> jax.Array:
    """Segment-sum into FEW segments (the 2R+1 relation rows).

    XLA lowers the scatter mostly serially (~0.6 ms per half per step at
    WN18RR scale, 25% of the whole backward); with few segments the sum is a
    ``onehot(ids)ᵀ @ vals`` MXU matmul instead.  The one-hot is exact in bf16,
    so splitting ``vals`` into hi/lo bf16 halves keeps ~2^-17 relative accuracy
    in two MXU passes (same precision model as the forward kernel).  When the one-hot would be
    large (many relations, e.g. FB15k-237), the precomputed rel-sorted
    permutation ``rdata = (rperm, r_indptr, r_rel)`` routes the sum through
    the Pallas CSR kernel instead (XLA scatter as last resort).
    """
    e = vals.shape[0]
    if n_seg * e > ONEHOT_LIMIT:   # one-hot exceeds the element budget
        if rdata is None:
            return jax.ops.segment_sum(vals, ids, num_segments=n_seg)
        rperm, r_indptr, r_rel = rdata
        d = vals.shape[1]
        out = segment_sum_pallas(_pad_cols(vals[rperm]), r_rel, r_indptr,
                                 n_seg, interpret=interpret)
        return out[:, :d]
    onehot_t = (ids[None, :] == jnp.arange(n_seg, dtype=ids.dtype)[:, None]
                ).astype(jnp.bfloat16)                       # (n_seg, E)
    dn = (((1,), (0,)), ((), ()))
    if vals.dtype == jnp.bfloat16:     # bf16 message mode: one exact MXU pass
        return jax.lax.dot_general(onehot_t, vals, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(onehot_t, hi, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(onehot_t, lo, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32))


def _agg_bwd(n_ent, interpret, msg_dtype, rel_onehot, ew_pallas, bwd_perm,
             res, g):
    from kgc_gcn_tpu.ops.elementwise_pallas import _pick_tile, bwd_products
    (x, rel_all, etab, src, dst, rel, norm,
     sperm, s_indptr, s_src, rdata, sdata, w_s) = res
    xg = x[src]
    rg = rel_rows_onehot(rel_all, rel) if rel_onehot else rel_all[rel]
    gd = g[dst] * norm[:, None]                  # (E, D) cotangent per edge

    # the three cotangent products share operands; XLA lowers them as three
    # fusions re-reading gd/xg/rg/etab (1.03 ms/step traced) — the Pallas
    # kernel emits all three in one HBM pass (0.64 ms roofline)
    if (ew_pallas and bwd_perm == "contrib" and _pick_tile(src.shape[0])
            and not interpret
            # bwd_products emits contrib already cast to msg_dtype, which
            # would silently no-op BF16_CAST='post' — honor the knob by
            # falling back to the XLA products in that combination
            and not (msg_dtype != "float32" and BF16_CAST == "post")):
        contrib, d_rel_in, d_etab = bwd_products(
            gd, xg, rg, etab, msg_dtype, interpret)
    else:
        contrib = None if bwd_perm in ("operands", "fwdw") \
            else gd * rg * etab
        d_rel_in = gd * xg * etab
        d_etab = gd * xg * rg
        if (msg_dtype == "float32" and contrib is not None
                and MGCN_CONTRIB == "bf16"):
            # opt-in: halve ONLY the permutation stream's bytes in an
            # otherwise-f32 step (the round-5 RGCN readback trick)
            contrib = contrib.astype(jnp.bfloat16)
        if msg_dtype != "float32":
            d_rel_in = d_rel_in.astype(msg_dtype)
            if contrib is not None and BF16_CAST == "pre":
                # cast before the s-perm gather: halves the bytes the
                # permutation moves, BUT at FB15k scale XLA unfuses a bf16
                # convert+gather into a layout copy (BENCH_NOTES round 3) —
                # BF16_CAST='post' (KGC_BF16_CAST) permutes in f32 and casts
                # after, keeping the gather fused
                contrib = contrib.astype(msg_dtype)

    # d_x: a segment-sum over SOURCE, so the kernel needs the cotangent
    # stream in src-sorted edge order.  Two ways to get it there:
    #   contrib  — compose in dst order, permute the (E, D) product
    #              (``contrib[sperm]``, one large dynamic-row gather);
    #   operands — compose DIRECTLY in src order from the precomputed static
    #              index arrays: g rows via the small-source ``g[s_dst]``
    #              gather, relation rows from the tiny table, and only the
    #              parameter table crosses the permutation (``etab[sperm]``),
    #              which XLA can schedule independently of the cotangent
    #              dataflow.  Structurally one (E, D) permutation movement is
    #              irreducible either way (each half needs its edge stream in
    #              both dst and src order per step); the variants differ only
    #              in WHAT crosses and how it schedules — A/B on hardware.
    if bwd_perm == "fwdw":
        s_dst, s_norm, _ = sdata
        contrib_s = (g[s_dst] * s_norm[:, None]) * w_s
        if msg_dtype != "float32":
            contrib_s = contrib_s.astype(msg_dtype)
    elif bwd_perm == "operands":
        s_dst, s_norm, s_rel = sdata
        rg_s = rel_rows_onehot(rel_all, s_rel) if rel_onehot \
            else rel_all[s_rel]
        contrib_s = (g[s_dst] * s_norm[:, None]) * rg_s * etab[sperm]
        if msg_dtype != "float32":
            contrib_s = contrib_s.astype(msg_dtype)
    else:
        if SPERM_BARRIER:
            # scheduling experiment: fence the permutation gather so XLA
            # schedules it as an isolated region (see the knob's comment)
            (contrib,) = jax.lax.optimization_barrier((contrib,))
            contrib_s = contrib[sperm]
            (contrib_s,) = jax.lax.optimization_barrier((contrib_s,))
        else:
            contrib_s = contrib[sperm]
        if msg_dtype != "float32" and contrib_s.dtype != jnp.bfloat16:
            contrib_s = contrib_s.astype(msg_dtype)   # BF16_CAST='post'
    dx = segment_sum_pallas(
        contrib_s, s_src, s_indptr, x.shape[0], interpret=interpret)

    # d_rel: few segments — one-hot MXU matmul (rel-sorted Pallas for many rels)
    d_rel = _segment_sum_few(d_rel_in, rel, rel_all.shape[0],
                             rdata=rdata, interpret=interpret)

    # d_etab: the table slice is stored in THIS edge order (positional), so
    # its gradient is just the dense per-edge product — no permutation, no
    # scatter (padding rows have norm 0, hence zero gradient)

    return (dx, d_rel, d_etab) + (None,) * 10


_aggregate_cvjp.defvjp(_agg_fwd, _agg_bwd)


def aggregate_stacked_xla(x, rel_all, etab2, stacked, n_ent: int,
                          interpret: bool = False,
                          msg_dtype: str = "float32",
                          rel_onehot: bool = False):
    """Both halves through ONE kernel launch with XLA-precomposed messages.

    The in-VMEM-compose stacked kernel (aggregate_stacked_pallas) lost to the
    per-half schedule single-chip because its extra DMA streams + per-chunk
    relation matmuls cost more than the XLA passes they replaced
    (BENCH_NOTES).  This variant keeps XLA's compose fusion and only merges
    the LAUNCHES: the stacked view's dst ids live in [0, 2N) and the
    concatenated halves stay globally dst-sorted, so the per-half custom VJP
    applies verbatim with ``n_rows = 2N`` — one forward kernel, one backward
    d_x kernel (the stacked src-sorted permutation sums BOTH halves'
    cotangents into x in a single pass), one d_rel one-hot.

    ``etab2`` is the whole positional table as (2*E_pad, d) — stacked
    position k is table row k.  Returns ``(in_agg, out_agg)`` each (N, d).
    """
    out = _aggregate_cvjp(
        x, rel_all, etab2, stacked.src, stacked.dst2, stacked.rel,
        stacked.norm, stacked.indptr, stacked.sperm, stacked.s_indptr,
        stacked.s_src, (stacked.rperm, stacked.r_indptr, stacked.r_rel),
        (None, None, None),   # src-order operand metadata: contrib mode only
        2 * n_ent, interpret, msg_dtype, rel_onehot, False, "contrib")
    return out[:n_ent], out[n_ent:]


def aggregate_half_pallas(x, rel_all, etab, half: GraphHalf, n_ent: int,
                          interpret: bool = False,
                          msg_dtype: str = "float32",
                          rel_onehot: bool = False,
                          ew_pallas: bool = False,
                          bwd_perm: str = "contrib"):
    # keyword defaults mirror the Config defaults (rel_compose='gather',
    # ew_impl='xla' — the variants measured fastest and exact); the opt-in
    # alternates are selected explicitly by the model from the config
    """Pallas-backed drop-in for ops.scatter.aggregate_half.

    ``etab`` is this half's per-edge embedding slice in the half's dst-sorted
    edge order (positional — see models/mgcn.py for the table layout).

    Forward: compose per-edge messages (XLA fuses the gathers + elementwise),
    then MXU segment-sum over dst.  Backward: cotangents flow through

      * ``d_msg = g[dst] * (partners)`` — gathers + elementwise (XLA),
      * ``d_x`` — a segment-sum over SOURCE, evaluated with this same kernel
        on the src-sorted permutation (``half.sperm``/``half.s_indptr``),
      * ``d_rel`` — one-hot MXU matmul over relation ids,
      * ``d_etab`` — the dense per-edge product itself (positional layout
        makes the edge-embedding gradient scatter-free).
    """
    return _aggregate_cvjp(
        x, rel_all, etab, half.src, half.dst, half.rel,
        half.norm, half.indptr, half.sperm, half.s_indptr, half.s_src,
        (half.rperm, half.r_indptr, half.r_rel),
        (half.s_dst, half.s_norm, half.s_rel),
        n_ent, interpret, msg_dtype, rel_onehot, ew_pallas, bwd_perm)


# ----------------------------------------------------- CSR segment-max kernel

ATTN_MAX = os.environ.get("KGC_ATTN_MAX", "pallas")
#   'pallas' routes the RGAT softmax's forward segment-max through the tiled
#   CSR max kernel below; 'xla' keeps jax.ops.segment_max (scatter-max
#   lowering, ~1.2 ms per half at WN18RR scale — BENCH_NOTES round 3).
#   Module knob (not a Config field) so ab_variants can A/B it in-session.


def _seg_max_kernel(bounds_ref, logt_hbm, dst_hbm, out_ref,
                    log_vmem, dst_vmem, sems, *, tile_n, tile_e, n_heads):
    """Per-segment MAX over dst-sorted edges for NARROW values (the RGAT
    (E, H) attention logits).

    Same CSR tiling/double-buffered-DMA structure as ``_seg_kernel``, but max
    has no sum-of-products form so the one-hot MXU trick doesn't apply —
    instead each head is a masked VPU lane-reduction: broadcast the head's
    (1, tile_e) logit row against the (tile_n, tile_e) dst-match mask, take
    ``max`` over the edge lanes, and combine into the running per-row max.
    Logits arrive TRANSPOSED (H_pad, E_pad) so a head is a sublane row —
    no in-kernel transpose.  Out-of-range edges self-mask exactly as in the
    sum kernel (their dst falls outside the tile's rows); empty segments
    keep the -inf init, matching ``jax.ops.segment_max`` identity.
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    row0 = t * tile_n
    a0 = pl.multiple_of((start // tile_e) * tile_e, tile_e)

    out_ref[:] = jnp.full_like(out_ref, -jnp.inf)
    n_chunks = pl.cdiv(end - a0, tile_e)

    def dmas(slot, ci):
        e0 = pl.multiple_of(a0 + ci * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                logt_hbm.at[:, pl.ds(e0, tile_e)], log_vmem.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(e0, tile_e)], dst_vmem.at[slot],
                sems.at[slot, 1]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            for cp in dmas(1 - slot, ci + 1):
                cp.start()

        for cp in dmas(slot, ci):
            cp.wait()

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_e), 0) + row0
        mine = rows == dst_vmem[slot]                    # (tile_n, tile_e)
        for h in range(n_heads):                         # static: H is tiny
            vals = jnp.where(mine, log_vmem[slot][h:h + 1, :], -jnp.inf)
            red = jnp.max(vals, axis=1, keepdims=True)   # (tile_n, 1)
            out_ref[:, h:h + 1] = jnp.maximum(out_ref[:, h:h + 1], red)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def segment_max_sorted(logits: jax.Array, seg: jax.Array, indptr: jax.Array,
                       n_rows: int, interpret: bool = False) -> jax.Array:
    """Sorted-COO segment-max: (E, H) logits + non-decreasing (E,) seg ->
    (n_rows, H); empty segments get -inf (the ``jax.ops.segment_max``
    identity).  NOT differentiable — the only caller is the softmax max
    subtraction, whose gradient is exactly zero (shift invariance), so wrap
    in ``stop_gradient``."""
    e_orig, h_orig = logits.shape
    tile_e = TILE_E
    tile_n = TILE_N
    h_pad = -(-h_orig // 8) * 8
    e_total = -(-e_orig // tile_e) * tile_e
    logt = jnp.pad(logits, ((0, e_total - e_orig), (0, h_pad - h_orig))).T
    if e_total != e_orig:
        seg = jnp.pad(seg, (0, e_total - e_orig),
                      constant_values=np.int32(2**30))
    n_tiles = -(-n_rows // tile_n)

    tile_rows = jnp.minimum(np.arange(n_tiles + 1) * tile_n, n_rows)
    bounds = indptr[tile_rows].astype(jnp.int32)

    kernel = functools.partial(_seg_max_kernel, tile_n=tile_n, tile_e=tile_e,
                               n_heads=h_orig)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # logitsᵀ stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),   # seg ids stay in HBM
            ],
            out_specs=pl.BlockSpec(
                (tile_n, h_pad), lambda t, bounds: (t, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, h_pad, tile_e), logt.dtype),
                pltpu.VMEM((2, 1, tile_e), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, h_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, logt, seg.reshape(1, -1))
    return out[:n_rows, :h_orig]


# ------------------------------------------------ fused basis-RGCN kernel

def _basis_kernel(bounds_ref, msg_hbm, a_hbm, dst_hbm, out_ref,
                  msg_vmem, a_vmem, dst_vmem, sems,
                  *, tile_n, tile_e, n_b, d_pad, variant="loop"):
    """Fused basis-decomposed aggregation: out[n, b*d:(b+1)*d] =
    Σ_{e: dst_e = n} a[e, b] * msg[e, :].

    The naive schedule materializes the (E, B*d_in) weighted expansion to
    HBM (3.3 GB per half per pass at FB15k config 3 — measured to LOSE even
    on the MXU kernel, BENCH_NOTES round 4); here the expansion lives only
    in VMEM: per chunk, scale the (tile_e, d) message block by each basis
    coefficient column and accumulate through the dst one-hot MXU matmul
    into that basis' slice of the (tile_n, B*d) output block.  HBM traffic
    is E*(d + B) in, N*B*d out.
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    row0 = t * tile_n
    a0 = pl.multiple_of((start // tile_e) * tile_e, tile_e)

    out_ref[:] = jnp.zeros_like(out_ref)
    n_chunks = pl.cdiv(end - a0, tile_e)

    def dmas(slot, ci):
        e0 = pl.multiple_of(a0 + ci * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                msg_hbm.at[pl.ds(e0, tile_e), :], msg_vmem.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(e0, tile_e), :], a_vmem.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(e0, tile_e)], dst_vmem.at[slot],
                sems.at[slot, 2]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            for cp in dmas(1 - slot, ci + 1):
                cp.start()

        for cp in dmas(slot, ci):
            cp.wait()

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_e), 0) + row0
        dn = (((1,), (0,)), ((), ()))
        onehot_t = (rows == dst_vmem[slot]).astype(jnp.bfloat16)
        m = msg_vmem[slot]
        a = a_vmem[slot]
        if variant == "v3d":
            # one (tile_e, B*d_pad) expansion + one hi/lo matmul pair for
            # the whole out block — no per-basis VPU loop (round 5).  The
            # coefficient expands into lane layout via a tiny hi/lo MXU
            # matmul against the (B, B*d_pad) block indicator (a (E_t, B, 1)
            # broadcast view is an unsupported lane->sublane 3D gather in
            # Mosaic); the message tiles along lanes with a concat.
            krows = (jax.lax.broadcasted_iota(
                jnp.int32, (n_b, n_b * d_pad), 1) // d_pad
                == jax.lax.broadcasted_iota(
                    jnp.int32, (n_b, n_b * d_pad), 0)).astype(jnp.bfloat16)
            an = a[:, :n_b]
            ahi = an.astype(jnp.bfloat16)
            alo = (an - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn2 = (((1,), (0,)), ((), ()))
            a_exp = (jax.lax.dot_general(
                ahi, krows, dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    alo, krows, dimension_numbers=dn2,
                    preferred_element_type=jnp.float32))
            exp3 = jnp.concatenate([m] * n_b, axis=1) * a_exp
            hi = exp3.astype(jnp.bfloat16)
            lo = (exp3 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[:, :] += (
                jax.lax.dot_general(onehot_t, hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot_t, lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))
            return 0
        if variant == "aexp":
            # per-basis loop, but the coefficient comes from a lane-layout
            # expansion (one hi/lo MXU matmul vs the block indicator) — no
            # (E_t, 1) lane-extract broadcast per basis
            krows = (jax.lax.broadcasted_iota(
                jnp.int32, (n_b, n_b * d_pad), 1) // d_pad
                == jax.lax.broadcasted_iota(
                    jnp.int32, (n_b, n_b * d_pad), 0)).astype(jnp.bfloat16)
            an = a[:, :n_b]
            ahi = an.astype(jnp.bfloat16)
            alo = (an - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn2 = (((1,), (0,)), ((), ()))
            a_exp = (jax.lax.dot_general(
                ahi, krows, dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    alo, krows, dimension_numbers=dn2,
                    preferred_element_type=jnp.float32))
            for b in range(n_b):
                sb = m * a_exp[:, b * d_pad:(b + 1) * d_pad]
                hi = sb.astype(jnp.bfloat16)
                lo = (sb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                out_ref[:, b * d_pad:(b + 1) * d_pad] += (
                    jax.lax.dot_general(onehot_t, hi, dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(onehot_t, lo,
                                          dimension_numbers=dn,
                                          preferred_element_type=jnp.float32))
            return 0
        for b in range(n_b):          # static: B is a config constant
            sb = m * a[:, b:b + 1]
            hi = sb.astype(jnp.bfloat16)
            lo = (sb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[:, b * d_pad:(b + 1) * d_pad] += (
                jax.lax.dot_general(onehot_t, hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot_t, lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "n_b", "interpret",
                                             "fwd_variant"))
def _basis_fused_call(msg, a, dst, indptr, n_rows: int, n_b: int,
                      interpret: bool = False, fwd_variant: str = "loop"):
    """(E, d) messages + (E, B) coefficients + sorted dst ->
    (n_rows, B*d_pad) f32 (caller reshapes/slices)."""
    e_orig, d_orig = msg.shape
    d_pad = -(-d_orig // 128) * 128
    # out block (tile_n, B*d_pad) f32 must stay ~<=1 MiB of the 16 MiB
    # scoped VMEM (plus per-b bf16 intermediates that scale with tile_e*d)
    if BASIS_FWD_TILE_N > 0:
        tile_n = BASIS_FWD_TILE_N
    else:
        tile_n = TILE_N
        while tile_n > 8 and tile_n * n_b * d_pad * 4 > 2**20:
            tile_n //= 2
    tile_e = min(TILE_E, 256)
    e_total = -(-e_orig // tile_e) * tile_e
    # Mosaic DMA slices must be 128-lane-aligned — pad the coefficient
    # columns too (B=30 -> 128; the extra stream is ~100 MB/pass at FB15k,
    # small next to the E*(d) message stream)
    b_pad = -(-a.shape[1] // 128) * 128
    if e_total != e_orig or d_pad != d_orig or b_pad != a.shape[1]:
        msg = jnp.pad(msg, ((0, e_total - e_orig), (0, d_pad - d_orig)))
        a = jnp.pad(a, ((0, e_total - e_orig), (0, b_pad - a.shape[1])))
        dst = jnp.pad(dst, (0, e_total - e_orig),
                      constant_values=np.int32(2**30))
    n_tiles = -(-n_rows // tile_n)

    tile_rows = jnp.minimum(np.arange(n_tiles + 1) * tile_n, n_rows)
    bounds = indptr[tile_rows].astype(jnp.int32)

    kernel = functools.partial(_basis_kernel, tile_n=tile_n, tile_e=tile_e,
                               n_b=n_b, d_pad=d_pad, variant=fwd_variant)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # msg in HBM
                pl.BlockSpec(memory_space=pl.ANY),   # coeff rows in HBM
                pl.BlockSpec(memory_space=pl.ANY),   # dst ids in HBM
            ],
            out_specs=pl.BlockSpec(
                (tile_n, n_b * d_pad), lambda t, bounds: (t, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tile_e, d_pad), msg.dtype),
                pltpu.VMEM((2, tile_e, b_pad), a.dtype),
                pltpu.VMEM((2, 1, tile_e), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_n, n_b * d_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, msg, a, dst.reshape(1, -1))
    return out[:n_rows]


def build_basis_bwd_plan(half, n_rows: int,
                         tile_n: int = None, tile_e: int = None):
    """Host-side layout for the basis BACKWARD kernel (_basis_bwd_kernel).

    The backward needs, per edge, the cotangent row ``g[dst_e]`` mixed over
    bases — materializing it is a (E, B*d) large-source gather measured at
    56 ms/step (+27 ms of retiling copies) at FB15k config 3.  The kernel
    instead walks edges grouped by DESTINATION ROW TILE: each tile's g rows
    are DMA'd once and every edge selects its row with a one-hot MXU matmul.
    Race-free per-edge outputs need each tile to own EXCLUSIVE, aligned
    output ranges, so edges are re-laid-out into per-tile ranges padded to
    ``tile_e`` multiples:

    The padded-order OPERAND arrays are precomputed here too (src/rel/norm/
    dst in padded order, a real-entry mask, and the src-sorted readback
    permutation ``sperm_pad = inv_pos[sperm]``): gathering them at trace
    time through a pad_map indirection would read (E, 128) LARGE-SOURCE
    intermediates — measured 21.8 ms/step of gathers at FB15k config 3 —
    while the precomputed layout gathers only from the small x/coeff
    tables.  Everything depends only on the static graph half — computed
    once by the model's ``prepare_kernels``.
    """
    if tile_n is None:
        tile_n = BASIS_TILE_N
    if tile_e is None:
        tile_e = BASIS_TILE_E
    from kgc_gcn_tpu.parallel.distributed import host_array
    ip = host_array(half.indptr).astype(np.int64)
    src = host_array(half.src)
    rel = host_array(half.rel)
    norm = host_array(half.norm)
    dst = host_array(half.dst)
    sperm = host_array(half.sperm)
    n_tiles = -(-n_rows // tile_n)
    counts, starts, ends = [], [], []
    for t in range(n_tiles):
        s = int(ip[t * tile_n])
        e = int(ip[min((t + 1) * tile_n, n_rows)])
        starts.append(s)
        ends.append(e)
        counts.append(-(-(e - s) // tile_e))
    chunk_bounds = np.zeros(n_tiles + 1, np.int32)
    chunk_bounds[1:] = np.cumsum(counts)
    e_pad2 = int(chunk_bounds[-1]) * tile_e
    pad_map = np.zeros(max(e_pad2, tile_e), np.int32)
    maskp = np.zeros(max(e_pad2, tile_e), np.float32)
    inv_pos = np.zeros(len(src), np.int32)
    for t in range(n_tiles):
        s, e = starts[t], ends[t]
        o = int(chunk_bounds[t]) * tile_e
        pad_map[o: o + counts[t] * tile_e] = s   # padding -> first edge
        pad_map[o: o + (e - s)] = np.arange(s, e)
        maskp[o: o + (e - s)] = 1.0
        inv_pos[s:e] = o + np.arange(e - s)
    arrays = (
        jnp.asarray(src[pad_map]),             # srcp
        jnp.asarray(rel[pad_map]),             # relp
        jnp.asarray(norm[pad_map]),            # normp
        jnp.asarray(dst[pad_map].reshape(1, -1)),  # dstp (kernel row layout)
        jnp.asarray(maskp),
        jnp.asarray(inv_pos[sperm]),           # sperm_pad
        jnp.asarray(norm[sperm]),              # s_normp
        jnp.asarray(chunk_bounds),
    )
    return arrays, (n_tiles, tile_n, tile_e)


def _basis_bwd_kernel(bounds_ref, g_hbm, msgp_hbm, ap_hbm, dstp_hbm,
                      dmsg_ref, da_ref,
                      g_vmem, ghi_vmem, glo_vmem, msg_vmem, a_vmem,
                      dst_vmem, dmsg_vmem, da_vmem, sems, osems,
                      *, tile_n, tile_e, n_b, d_pad, variant="full"):
    """Per destination-row tile: DMA the tile's (tile_n, B*d_pad) cotangent
    rows once, then per edge chunk select rows via the one-hot MXU matmul
    (``sel = onehot(dst) @ g_tile``, hi/lo bf16 for f32 accuracy) and emit

      * ``d_msg = Σ_b sel_b * a_b``        (per-edge, (tile_e, d_pad))
      * ``d_a[:, b] = Σ_d sel_b * msg``    (per-edge, per-basis)

    to the tile's EXCLUSIVE padded output ranges (build_basis_bwd_plan).
    """
    t = pl.program_id(0)
    c0 = bounds_ref[t]
    c1 = bounds_ref[t + 1]
    row0 = t * tile_n
    n_chunks = c1 - c0

    gcp = pltpu.make_async_copy(
        g_hbm.at[pl.ds(pl.multiple_of(row0, tile_n), tile_n), :],
        g_vmem, sems.at[0, 2])
    gcp.start()

    def dmas(slot, ci):
        e0 = (c0 + ci) * tile_e
        e0 = pl.multiple_of(e0, tile_e)
        return (
            pltpu.make_async_copy(
                msgp_hbm.at[pl.ds(e0, tile_e), :], msg_vmem.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                ap_hbm.at[pl.ds(e0, tile_e), :], a_vmem.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                dstp_hbm.at[:, pl.ds(e0, tile_e)], dst_vmem.at[slot],
                sems.at[slot, 3]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    gcp.wait()
    ghi_vmem[:] = g_vmem[:].astype(jnp.bfloat16)
    glo_vmem[:] = (g_vmem[:] - ghi_vmem[:].astype(jnp.float32)
                   ).astype(jnp.bfloat16)

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            for cp in dmas(1 - slot, ci + 1):
                cp.start()

        for cp in dmas(slot, ci):
            cp.wait()

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_e), 0) + row0
        mine = (rows == dst_vmem[slot]).astype(jnp.bfloat16)  # (tile_n, E_t)
        dn = (((0,), (0,)), ((), ()))    # contract the row dim -> (E_t, Bd)
        a = a_vmem[slot]
        m = msg_vmem[slot]
        oslot = jax.lax.rem(ci, 2)
        if variant == "dma_only":
            sel = jnp.zeros((tile_e, n_b * d_pad), jnp.float32)
        else:
            sel = (jax.lax.dot_general(mine, ghi_vmem[:],
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(mine, glo_vmem[:],
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.float32))

        @pl.when(ci >= 2)
        def _():   # the slot's previous writes must land before reuse
            pltpu.make_async_copy(dmsg_vmem.at[oslot], dmsg_vmem.at[oslot],
                                  osems.at[oslot, 0]).wait()
            pltpu.make_async_copy(da_vmem.at[oslot], da_vmem.at[oslot],
                                  osems.at[oslot, 1]).wait()

        if variant == "v3d":
            # one 3D view of sel serves BOTH cotangents: d_msg reduces over
            # the basis dim, d_a over the lane dim — no 30-iteration VPU
            # dependency chains, no width-1 column stores (the round-5
            # attribution put the sequential acc loop at ~9.2 of the 18 ms).
            # The per-(edge, basis) coefficient broadcast cannot be a
            # (E_t, B, 1) view — Mosaic lowers that lane->sublane move as an
            # unsupported 3D gather — so a rides a tiny hi/lo MXU matmul
            # against the (B, B*d_pad) block indicator into lane layout.
            sel3 = sel.reshape(tile_e, n_b, d_pad)
            krows = (jax.lax.broadcasted_iota(
                jnp.int32, (n_b, n_b * d_pad), 1) // d_pad
                == jax.lax.broadcasted_iota(
                    jnp.int32, (n_b, n_b * d_pad), 0)).astype(jnp.bfloat16)
            an = a[:, :n_b]
            ahi = an.astype(jnp.bfloat16)
            alo = (an - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn2 = (((1,), (0,)), ((), ()))
            a_exp = (jax.lax.dot_general(
                ahi, krows, dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    alo, krows, dimension_numbers=dn2,
                    preferred_element_type=jnp.float32))
            dmsg_vmem[oslot] = jnp.sum(
                (sel * a_exp).reshape(tile_e, n_b, d_pad), axis=1)
            da_vmem[oslot] = jnp.zeros_like(da_vmem[oslot])
            da_vmem[oslot, :, :n_b] = jnp.sum(sel3 * m[:, None, :], axis=2)
        elif variant == "aexp_da_matmul":
            # expand a into LANE layout once (hi/lo MXU vs the block
            # indicator) so the d_msg loop is pure full-lane mul/adds — no
            # per-basis (E_t, 1) lane-extract broadcasts (hypothesis from
            # the tree-null: the acc loop's cost is the 30 lane-strided
            # coefficient reads, not the add chain)
            krows = (jax.lax.broadcasted_iota(
                jnp.int32, (n_b, n_b * d_pad), 1) // d_pad
                == jax.lax.broadcasted_iota(
                    jnp.int32, (n_b, n_b * d_pad), 0)).astype(jnp.bfloat16)
            an = a[:, :n_b]
            ahi = an.astype(jnp.bfloat16)
            alo = (an - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn2 = (((1,), (0,)), ((), ()))
            a_exp = (jax.lax.dot_general(
                ahi, krows, dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    alo, krows, dimension_numbers=dn2,
                    preferred_element_type=jnp.float32))
            d2 = sel * a_exp
            acc = d2[:, 0:d_pad]
            for b in range(1, n_b):
                acc += d2[:, b * d_pad:(b + 1) * d_pad]
            dmsg_vmem[oslot] = acc
        elif variant in ("tree", "tree_da_matmul"):
            # balanced-tree reduction of the per-basis products (depth
            # ceil(log2 B) instead of a 30-deep sequential add chain)
            parts = [sel[:, b * d_pad:(b + 1) * d_pad] * a[:, b:b + 1]
                     for b in range(n_b)]
            while len(parts) > 1:
                parts = [parts[i] + parts[i + 1]
                         if i + 1 < len(parts) else parts[i]
                         for i in range(0, len(parts), 2)]
            dmsg_vmem[oslot] = parts[0]
        elif variant in ("full", "da_matmul", "no_da"):
            acc = sel[:, 0:d_pad] * a[:, 0:1]
            for b in range(1, n_b):
                acc += sel[:, b * d_pad:(b + 1) * d_pad] * a[:, b:b + 1]
            dmsg_vmem[oslot] = acc
        else:
            dmsg_vmem[oslot] = sel[:, 0:d_pad]
        if variant in ("da_matmul", "tree_da_matmul", "aexp_da_matmul"):
            # d_a[e, b] = sum_d sel[e, b, d] * m[e, d] as ONE matmul: the
            # per-b products concatenate back to (E_t, B*d_pad) and contract
            # against the 0/1 block indicator K[r, c] = (r // d_pad == c) —
            # MXU work instead of 30 width-1 sublane stores + lane reduces
            dprod = jnp.concatenate(
                [sel[:, b * d_pad:(b + 1) * d_pad] * m
                 for b in range(n_b)], axis=1)
            khot = (jax.lax.broadcasted_iota(
                jnp.int32, (n_b * d_pad, 128), 0) // d_pad
                == jax.lax.broadcasted_iota(
                    jnp.int32, (n_b * d_pad, 128), 1)).astype(jnp.bfloat16)
            dhi = dprod.astype(jnp.bfloat16)
            dlo = (dprod - dhi.astype(jnp.float32)).astype(jnp.bfloat16)
            da_vmem[oslot] = (
                jax.lax.dot_general(
                    dhi, khot, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    dlo, khot, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        elif variant in ("no_da", "no_dmsg", "dma_only"):
            da_vmem[oslot] = jnp.zeros_like(da_vmem[oslot])
        elif variant != "v3d":
            da_vmem[oslot] = jnp.zeros_like(da_vmem[oslot])
            for b in range(n_b):
                da_vmem[oslot, :, b:b + 1] = jnp.sum(
                    sel[:, b * d_pad:(b + 1) * d_pad] * m, axis=1,
                    keepdims=True)

        e0 = pl.multiple_of((c0 + ci) * tile_e, tile_e)
        pltpu.make_async_copy(dmsg_vmem.at[oslot],
                              dmsg_ref.at[pl.ds(e0, tile_e), :],
                              osems.at[oslot, 0]).start()
        pltpu.make_async_copy(da_vmem.at[oslot],
                              da_ref.at[pl.ds(e0, tile_e), :],
                              osems.at[oslot, 1]).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(n_chunks >= 1)
    def _():
        last = jax.lax.rem(n_chunks - 1, 2)
        pltpu.make_async_copy(dmsg_vmem.at[last], dmsg_vmem.at[last],
                              osems.at[last, 0]).wait()
        pltpu.make_async_copy(da_vmem.at[last], da_vmem.at[last],
                              osems.at[last, 1]).wait()

    @pl.when(n_chunks >= 2)
    def _():
        prev = jax.lax.rem(n_chunks - 2, 2)
        pltpu.make_async_copy(dmsg_vmem.at[prev], dmsg_vmem.at[prev],
                              osems.at[prev, 0]).wait()
        pltpu.make_async_copy(da_vmem.at[prev], da_vmem.at[prev],
                              osems.at[prev, 1]).wait()


@functools.partial(jax.jit, static_argnames=("n_tiles", "tile_n", "tile_e",
                                             "n_b", "interpret", "variant"))
def _basis_bwd_call(g128, msgp, ap, dstp, chunk_bounds,
                    n_tiles: int, tile_n: int, tile_e: int, n_b: int,
                    interpret: bool = False, variant: str = "full"):
    """(n_tiles*tile_n, B*d_pad) padded cotangent rows + padded-edge-order
    msg/a/dst -> (E_pad2, d_pad) d_msg and (E_pad2, 128) d_a (first n_b
    columns real)."""
    d_pad = msgp.shape[1]
    e_pad2 = msgp.shape[0]
    b128 = ap.shape[1]
    dmsg, da = pl.pallas_call(
        functools.partial(_basis_bwd_kernel, tile_n=tile_n, tile_e=tile_e,
                          n_b=n_b, d_pad=d_pad, variant=variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=[
                pltpu.VMEM((tile_n, n_b * d_pad), jnp.float32),
                pltpu.VMEM((tile_n, n_b * d_pad), jnp.bfloat16),
                pltpu.VMEM((tile_n, n_b * d_pad), jnp.bfloat16),
                pltpu.VMEM((2, tile_e, d_pad), jnp.float32),
                pltpu.VMEM((2, tile_e, b128), jnp.float32),
                pltpu.VMEM((2, 1, tile_e), jnp.int32),
                pltpu.VMEM((2, tile_e, d_pad), jnp.float32),
                pltpu.VMEM((2, tile_e, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((e_pad2, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((e_pad2, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(chunk_bounds, g128, msgp, ap, dstp)
    return dmsg, da


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def basis_aggregate_fused(x, coeff, src, dst, rel, norm,
                          indptr, sperm, s_indptr, s_src, rdata, plan,
                          n_ent, n_b, interpret, plan_meta):
    """agg[n, b, :] = Σ_{e: dst_e=n} coeff[rel_e, b] * norm_e * x[src_e]
    with the (E, B*d_in) expansion never touching HBM in the FORWARD
    (see _basis_kernel).  Returns (n_ent, B, d_in).

    Backward: with ``plan`` (build_basis_bwd_plan arrays + its static
    ``plan_meta``) the per-edge cotangent products run the dst-tile band
    kernel (_basis_bwd_kernel) — the XLA fallback's (E, B*d) gather +
    contractions measured 103 ms/step at FB15k config 3.  Either way d_x
    routes through the src-sorted CSR kernel and d_coeff through the
    one-hot MXU matmul (no XLA scatters).
    """
    del plan
    d = x.shape[1]
    d_pad = -(-d // 128) * 128
    if BASIS_PAD == "through":
        # pad the SMALL tables; the (E, d_pad)/(E, 128) operands come out
        # of the gathers already padded and the output stays (N, B, d_pad)
        # (caller einsums against zero-padded basis rows — exactly inert)
        msg = _pad_cols(x)[src] * norm[:, None]
        a = _pad_cols(coeff)[rel]
        out = _basis_fused_call(msg, a, dst, indptr, n_ent, n_b, interpret,
                                BASIS_FWD_VARIANT)
        return out.reshape(n_ent, n_b, d_pad)
    msg = x[src] * norm[:, None]
    a = coeff[rel]
    out = _basis_fused_call(msg, a, dst, indptr, n_ent, n_b, interpret,
                            BASIS_FWD_VARIANT)
    return out.reshape(n_ent, n_b, d_pad)[:, :, :d]


def _basis_agg_fwd(x, coeff, src, dst, rel, norm, indptr, sperm, s_indptr,
                   s_src, rdata, plan, n_ent, n_b, interpret, plan_meta):
    out = basis_aggregate_fused(x, coeff, src, dst, rel, norm, indptr,
                                sperm, s_indptr, s_src, rdata, plan,
                                n_ent, n_b, interpret, plan_meta)
    return out, (x, coeff, src, dst, rel, norm, sperm, s_indptr, s_src,
                 rdata, plan)


def _basis_agg_bwd(n_ent, n_b, interpret, plan_meta, res, g):
    x, coeff, src, dst, rel, norm, sperm, s_indptr, s_src, rdata, plan = res
    d = x.shape[1]
    # pad the cotangent's feature dim to 128 FIRST: flat<->3D reshapes of a
    # 128-aligned last dim are free, while reshaping (E, B*100) retiles and
    # measured 27 ms/step of pure copies at FB15k config 3 (round-4 trace)
    d_pad = -(-d // 128) * 128
    # under BASIS_PAD='through' the cotangent arrives d_pad-wide already —
    # this pad (3.95 ms/step of copies at FB15k config 3) becomes a no-op
    g128 = jnp.pad(g, ((0, 0), (0, 0), (0, d_pad - g.shape[2])))
    if plan_meta is not None:
        (srcp, relp, normp, dstp, maskp, sperm_pad, s_normp,
         chunk_bounds) = plan
        n_tiles, tile_n, tile_e = plan_meta
        gflat = jnp.pad(g128.reshape(n_ent, n_b * d_pad),
                        ((0, n_tiles * tile_n - n_ent), (0, 0)))
        # padded-order operands gather from the SMALL x/coeff tables (the
        # pad_map indirection through (E, 128) intermediates measured
        # 21.8 ms/step of large-source gathers)
        if BASIS_PAD == "through":
            # gather FROM padded tables: the (E_pad2, *) operands come out
            # 128-wide with no per-stream pad pass
            msgp = _pad_cols(x)[srcp] * normp[:, None]
            ap = _pad_cols(coeff)[relp]
        else:
            msgp = _pad_cols(x[srcp] * normp[:, None])
            ap = _pad_cols(coeff[relp])
        # timing-only variants must never reach training — route them back
        # to the full schedule; these are numerics-equivalent
        var = BASIS_BWD_VARIANT if BASIS_BWD_VARIANT in (
            "da_matmul", "v3d", "tree", "tree_da_matmul",
            "aexp_da_matmul") else "full"
        dmsg_pad, da_pad = _basis_bwd_call(
            gflat, msgp, ap, dstp, chunk_bounds,
            n_tiles, tile_n, tile_e, n_b, interpret, var)
        if BASIS_READBACK == "narrow":
            contrib_s = dmsg_pad[:, :d][sperm_pad] * s_normp[:, None]
        elif BASIS_READBACK == "bf16":
            # halve the permuted bytes: cast the padded d_msg to bf16
            # BEFORE the s<->d gather; the d_x kernel accumulates f32
            # (same contrib-in-bf16 scheme as MGCN's compute_dtype mode,
            # edge_parallel.make_local_agg) — opt-in: ~2^-8 relative
            # rounding on the entity-embedding grads
            contrib_s = (dmsg_pad.astype(jnp.bfloat16)[sperm_pad]
                         * s_normp[:, None].astype(jnp.bfloat16))
        else:
            contrib_s = dmsg_pad[sperm_pad][:, :d] * s_normp[:, None]
        # d_coeff straight from the padded space: padding entries mask to
        # zero, so no (E,) readback gather is needed
        d_coeff = _segment_sum_few(
            da_pad * maskp[:, None], relp, coeff.shape[0], rdata=None,
            interpret=interpret)[:, :n_b]
        d_x = segment_sum_pallas(contrib_s, s_src, s_indptr, x.shape[0],
                                 interpret=interpret)[:, :d]
        return (d_x, d_coeff) + (None,) * 10
    else:
        gd = g128.reshape(n_ent, n_b * d_pad)[dst].reshape(-1, n_b, d_pad)
        a = coeff[rel]                                        # (E, B)
        m = x[src]                                            # (E, d)
        d_msg = jnp.einsum("ebd,eb->ed", gd, a,
                           preferred_element_type=jnp.float32)[:, :d]
        d_a = jnp.einsum("ebd,ed->eb", gd[:, :, :d], m * norm[:, None],
                         preferred_element_type=jnp.float32)
        contrib_s = (d_msg * norm[:, None])[sperm]
    d_x = segment_sum_pallas(contrib_s, s_src, s_indptr, x.shape[0],
                             interpret=interpret)[:, :d]
    d_coeff = _segment_sum_few(d_a, rel, coeff.shape[0], rdata=rdata,
                               interpret=interpret)[:, :n_b]
    return (d_x, d_coeff) + (None,) * 10


basis_aggregate_fused.defvjp(_basis_agg_fwd, _basis_agg_bwd)


# ------------------------------------------ attention edge-message compose

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def edge_compose(h, rel_mult, src, rel, sperm, s_indptr, s_src, rdata,
                 n_rows, interpret):
    """``z = h[src] * rel_mult[rel]`` with the backward scatters routed
    through the MXU kernels — the SHARED edge message of the RGAT layer.

    Round-4 trace finding (BENCH_NOTES): the attention layer consumed z on
    TWO paths — the logits einsum and the weighted aggregation — and while
    the aggregation's custom VJP ran its d_h through the CSR kernel, the
    logits path's ``z`` was plain autodiff, whose d_h/d_rel_mult lowered to
    a 4.8 ms/step XLA scatter-add pair at WN18RR scale (the single biggest
    line of the 34.9-steps/s profile).  Computing z ONCE through this op
    merges both paths' cotangents into one kernel-backed backward:

      * d_h   — CSR segment-sum over the src-sorted permutation,
      * d_rel — one-hot MXU matmul (rel-sorted CSR kernel at FB15k-scale
        vocabularies), sliced to the table's real rows.

    The weighted aggregation itself then needs no custom treatment: its
    ``segment_sum_sorted`` wrapper backward is a plain gather and the
    per-edge products autodiff elementwise, with d_z flowing back here.
    """
    del sperm, s_indptr, s_src, rdata
    return h[src] * rel_mult[rel]


def _edge_compose_fwd(h, rel_mult, src, rel, sperm, s_indptr, s_src, rdata,
                      n_rows, interpret):
    return h[src] * rel_mult[rel], (h, rel_mult, src, rel, sperm, s_indptr,
                                    s_src, rdata)


def _edge_compose_bwd(n_rows, interpret, res, g):
    h, rel_mult, src, rel, sperm, s_indptr, s_src, rdata = res
    d = g.shape[1]
    contrib = g * rel_mult[rel]
    if EDGE_CONTRIB == "bf16":
        # halve the d_h permutation bytes (the round-5 RGCN readback trick;
        # d_h still accumulates f32 in the kernel) — opt-in numerics knob
        contrib = contrib.astype(jnp.bfloat16)
    d_h = segment_sum_pallas(contrib[sperm], s_src, s_indptr,
                             n_rows, interpret=interpret)[:, :d]
    n_seg = rdata[1].shape[0] - 1
    d_rel = _segment_sum_few(g * h[src], rel, n_seg,
                             rdata=rdata, interpret=interpret)[
        : rel_mult.shape[0], :d]
    return (d_h, d_rel) + (None,) * 6


edge_compose.defvjp(_edge_compose_fwd, _edge_compose_bwd)


# ------------------------------- generic sorted segment-sum / gather wrappers

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def segment_sum_sorted(vals, seg, indptr, n_rows, interpret=False):
    """Differentiable sorted segment-sum through the CSR kernel for NARROW
    value widths (e.g. the RGAT (E, H) attention columns): pads the feature
    dim to one lane tile and runs the MXU kernel; the VJP is a plain gather
    (``g[seg]``).  XLA lowers the same op as a serial scatter-add (~1.2 ms
    per half at WN18RR scale vs ~0.6 ms here, BENCH_NOTES round 3)."""
    d = vals.shape[1]
    return segment_sum_pallas(_pad_cols(vals), seg, indptr, n_rows,
                              interpret=interpret)[:, :d]


def _sss_fwd(vals, seg, indptr, n_rows, interpret):
    out = segment_sum_sorted(vals, seg, indptr, n_rows, interpret)
    return out, seg


def _sss_bwd(n_rows, interpret, seg, g):
    return g[seg], None, None


segment_sum_sorted.defvjp(_sss_fwd, _sss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_rows_sorted(table, idx, indptr, n_rows, interpret=False):
    """``table[idx]`` whose BACKWARD is the sorted CSR kernel instead of
    XLA's serial scatter-add (``idx`` non-decreasing with ``indptr`` its
    row pointers — e.g. a per-dst gather over a dst-sorted half)."""
    del indptr
    return table[idx]


def _grs_fwd(table, idx, indptr, n_rows, interpret):
    return table[idx], (idx, indptr)


def _grs_bwd(n_rows, interpret, res, g):
    idx, indptr = res
    d = g.shape[1]
    d_tab = segment_sum_pallas(_pad_cols(g), idx, indptr, n_rows,
                               interpret=interpret)[:, :d]
    return d_tab, None, None


gather_rows_sorted.defvjp(_grs_fwd, _grs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def gather_rows_few(table, idx, n_rows, rdata, interpret=False):
    """``table[idx]`` for a SMALL table (e.g. per-relation attention bias)
    whose backward runs the one-hot MXU matmul / rel-sorted kernel
    (``_segment_sum_few``) instead of XLA's scatter-add.  ``rdata`` is the
    half's (rperm, r_indptr, r_rel) trio (array-valued, so it rides as a
    regular argument with a None cotangent — nondiff_argnums cannot hold
    tracers)."""
    del rdata
    return table[idx]


def _grf_fwd(table, idx, n_rows, rdata, interpret):
    return table[idx], (idx, rdata, table.shape[0])


def _grf_bwd(n_rows, interpret, res, g):
    idx, rdata, t_rows = res
    # n_rows is the segment-id space (e.g. 2R+1 incl. the loop relation);
    # the table itself may hold fewer rows (2R) — slice back
    d_tab = _segment_sum_few(g, idx, n_rows, rdata=rdata,
                             interpret=interpret)[:t_rows]
    return d_tab, None, None


gather_rows_few.defvjp(_grf_fwd, _grf_bwd)
