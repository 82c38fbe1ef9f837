"""Fused 1-vs-all scoring + BCE loss — the decoder tail without (B, N) traffic.

The reference trains with a dense multi-hot label matrix and probability-space
BCE over all N entities (reference data_loader.py:39-51, model.py:177-179,
main.py:62).  The smoothed label is affine in the true-object indicator
(data_loader.py:41-43):

    y = 1/N + (1 - eps) * multi_hot(label_idx)        (y = multi_hot if eps=0)

and BCE-with-logits is affine in y:

    f(x, y) = max(x, 0) - x*y + log1p(exp(-|x|))

so the total loss splits into a DENSE term that needs no labels at all and a
SPARSE correction over the <=L true entries per row:

    sum_ij w_i * [max(x,0) + log1p(exp(-|x|)) - base*x]
      - coeff * sum_b w_b * sum_l x[b, label_idx[b, l]]

with base = 1/N (0 when eps=0) and coeff = 1 - eps (1 when eps=0).  The (B, N)
label matrix never exists.  Two implementations:

  * ``sparse_bce_with_logits`` — takes dense logits (the scoring matmul still
    materializes them once); kills the on-device label scatter, the (B, N)
    label residual, and fuses the backward into one elementwise pass plus a
    tiny scatter.  Pure XLA: runs anywhere, GSPMD-safe.
  * ``fused_score_bce`` — Pallas classifier kernel: takes the decoder's query
    vectors ``h (B, d)`` and the entity matrix directly, streams entity tiles
    through VMEM, and reduces the loss on the fly — the (B, N) score matrix
    never touches HBM in either direction (the backward recomputes score
    tiles in VMEM and accumulates d_h / d_ent / d_bias with three MXU ops per
    tile).  This is the decoder analog of a fused softmax-cross-entropy
    classifier head.

Both require each row of ``label_idx`` to contain UNIQUE entity ids padded
with ``n_ent`` — guaranteed by the data layer (labels come from sr2o dict
keys, data/dataset.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FUSED_TILE_C = 512   # entity columns per kernel tile (sweep: scripts/tile_sweep.py)


def _split_base_coeff(n_ent: int, smooth: float):
    if smooth:
        return 1.0 / n_ent, 1.0 - smooth
    return 0.0, 1.0


def _true_logit_sum(logits, label_idx, row_mask):
    """sum_b w_b * sum_l logits[b, label_idx[b, l]] (pads = n_ent dropped)."""
    n_ent = logits.shape[1]
    valid = (label_idx < n_ent).astype(logits.dtype)
    gathered = jnp.take_along_axis(
        logits, jnp.minimum(label_idx, n_ent - 1), axis=1)
    return jnp.sum(jnp.sum(gathered * valid, axis=1) * row_mask)


# ------------------------------------------------- level 1: sparse-label BCE

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sparse_bce_core(logits, label_idx, row_mask, smooth):
    n_ent = logits.shape[1]
    base, coeff = _split_base_coeff(n_ent, smooth)
    w = row_mask[:, None]
    dense = jnp.sum(
        (jnp.maximum(logits, 0.0) - base * logits
         + jnp.log1p(jnp.exp(-jnp.abs(logits)))) * w)
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * n_ent
    return (dense - coeff * _true_logit_sum(logits, label_idx, row_mask)) / denom


def _sparse_bce_fwd(logits, label_idx, row_mask, smooth):
    return (_sparse_bce_core(logits, label_idx, row_mask, smooth),
            (logits, label_idx, row_mask))


def _sparse_bce_bwd(smooth, res, g):
    # d/dx f(x, y) = sigmoid(x) - y = (sigmoid(x) - base) - coeff*multi_hot:
    # one fused elementwise pass over (B, N) plus a tiny scatter at the true
    # entries (instead of building / reading a dense label matrix).
    logits, label_idx, row_mask = res
    n_ent = logits.shape[1]
    base, coeff = _split_base_coeff(n_ent, smooth)
    w = row_mask[:, None]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * n_ent
    scale = g / denom
    d = (jax.nn.sigmoid(logits) - base) * w * scale
    b = logits.shape[0]
    corr = jnp.broadcast_to((coeff * scale) * row_mask[:, None],
                            label_idx.shape)
    d = d.at[jnp.arange(b)[:, None], label_idx].add(-corr, mode="drop")
    return d, None, None


_sparse_bce_core.defvjp(_sparse_bce_fwd, _sparse_bce_bwd)


def sparse_bce_with_logits(
    logits: jax.Array,                     # (B, N)
    label_idx: jax.Array,                  # (B, L) unique ids, padded with N
    smooth: float = 0.0,
    row_mask: Optional[jax.Array] = None,  # (B,) 1.0 valid / 0.0 padding
) -> jax.Array:
    """BCE-with-logits against smoothed multi-hot labels given SPARSELY.

    Identical to ``bce_with_logits(logits, build_labels(label_idx, N, smooth),
    row_mask)`` without ever building the (B, N) label matrix."""
    if row_mask is None:
        row_mask = jnp.ones((logits.shape[0],), logits.dtype)
    return _sparse_bce_core(logits, label_idx, row_mask, float(smooth))


# -------------------------------------- level 2: Pallas classifier (no B x N)

def _fwd_kernel(h_ref, w_ref, ent_ref, bias_ref, acc_ref,
                *, n_ent, base, tile_c):
    """acc += sum_tile w * [relu(s) + log1p(exp(-|s|)) - base*s], s in VMEM."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[0, 0] = 0.0

    s = jax.lax.dot_general(
        h_ref[:], ent_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_ref[:]       # (B, T)
    ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * tile_c
    term = (jnp.maximum(s, 0.0) - base * s
            + jnp.log1p(jnp.exp(-jnp.abs(s)))) * w_ref[:]
    # where (not multiply): boundary-tile reads beyond N are garbage and may
    # be inf/nan, which a 0-multiply would keep
    acc_ref[0, 0] += jnp.sum(jnp.where(ids < n_ent, term, 0.0))


def _bwd_kernel(g_ref, h_ref, w_ref, ent_ref, bias_ref,
                dh_ref, dent_ref, dbias_ref, *, n_ent, base, tile_c):
    """Recompute the score tile, then three MXU ops: d_ent, d_bias, d_h."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    s = jax.lax.dot_general(
        h_ref[:], ent_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_ref[:]       # (B, T)
    ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * tile_c
    dl = jnp.where(ids < n_ent,
                   (jax.nn.sigmoid(s) - base) * w_ref[:] * g_ref[0, 0],
                   0.0)                                          # (B, T)
    dent_ref[:] = jax.lax.dot_general(                           # (T, D)
        dl, h_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbias_ref[:] = jnp.sum(dl, axis=0, keepdims=True)            # (1, T)
    # boundary-tile ent rows beyond N are garbage (possibly nan): 0-entries of
    # dl do NOT neutralize them through the matmul (0 * nan = nan) — mask rows
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, ent_ref.shape, 0) + t * tile_c
    ent_m = jnp.where(row_ids < n_ent, ent_ref[:], 0.0)
    dh_ref[:] += jax.lax.dot_general(                            # (B, D)
        dl, ent_m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dense_loss_pallas(h, ent, bias, row_mask, base, interpret):
    b, d = h.shape
    n_ent = ent.shape[0]
    tile_c = min(FUSED_TILE_C, -(-n_ent // 128) * 128)
    n_tiles = pl.cdiv(n_ent, tile_c)
    acc = pl.pallas_call(
        functools.partial(_fwd_kernel, n_ent=n_ent, base=base, tile_c=tile_c),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(h, row_mask[:, None], ent, bias.reshape(1, -1))
    return acc[0, 0]


def _dense_grads_pallas(g, h, ent, bias, row_mask, base, interpret):
    b, d = h.shape
    n_ent = ent.shape[0]
    tile_c = min(FUSED_TILE_C, -(-n_ent // 128) * 128)
    n_tiles = pl.cdiv(n_ent, tile_c)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_ent=n_ent, base=base, tile_c=tile_c),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((n_ent, d), jnp.float32),
            jax.ShapeDtypeStruct((1, n_ent), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(g.reshape(1, 1), h, row_mask[:, None], ent, bias.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_core(h, ent, bias, label_idx, row_mask, smooth, interpret):
    n_ent = ent.shape[0]
    base, coeff = _split_base_coeff(n_ent, smooth)
    dense = _dense_loss_pallas(h, ent, bias, row_mask, base, interpret)
    # sparse correction: score ONLY the true entries directly from (h, ent) —
    # (B, L) work instead of (B, N)
    valid = (label_idx < n_ent).astype(h.dtype)
    idx = jnp.minimum(label_idx, n_ent - 1)
    x_true = (jnp.einsum("bd,bld->bl", h, ent[idx],
                         preferred_element_type=jnp.float32)
              + bias[idx]) * valid
    true_sum = jnp.sum(jnp.sum(x_true, axis=1) * row_mask)
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * n_ent
    return (dense - coeff * true_sum) / denom


def _fused_fwd(h, ent, bias, label_idx, row_mask, smooth, interpret):
    return (_fused_core(h, ent, bias, label_idx, row_mask, smooth, interpret),
            (h, ent, bias, label_idx, row_mask))


def _fused_bwd(smooth, interpret, res, g):
    h, ent, bias, label_idx, row_mask = res
    n_ent = ent.shape[0]
    base, coeff = _split_base_coeff(n_ent, smooth)
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * n_ent
    gscale = g / denom

    dh, dent, dbias = _dense_grads_pallas(
        gscale, h, ent, bias, row_mask, base, interpret)
    dbias = dbias[0]

    # sparse correction: -coeff * gscale at the true entries
    bsz, lw = label_idx.shape
    valid = (label_idx < n_ent).astype(h.dtype)
    idx = jnp.minimum(label_idx, n_ent - 1)
    cw = (coeff * gscale) * row_mask[:, None] * valid            # (B, L)
    ent_rows = ent[idx]                                          # (B, L, D)
    dh = dh - jnp.einsum("bl,bld->bd", cw, ent_rows,
                         preferred_element_type=jnp.float32)
    dent = dent.at[label_idx].add(
        -cw[:, :, None] * h[:, None, :], mode="drop")
    dbias = dbias.at[label_idx.reshape(-1)].add(
        -cw.reshape(-1), mode="drop")
    return dh, dent, dbias, None, None


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_score_bce(
    h: jax.Array,                          # (B, d) decoder query vectors
    all_ent: jax.Array,                    # (N, d) entity matrix
    ent_bias: jax.Array,                   # (N,) per-entity score bias
    label_idx: jax.Array,                  # (B, L) unique ids, padded with N
    smooth: float = 0.0,
    row_mask: Optional[jax.Array] = None,  # (B,)
    interpret: bool = False,
) -> jax.Array:
    """BCE of ``h @ all_ent.T + ent_bias`` against smoothed multi-hot labels,
    with the (B, N) score matrix never leaving VMEM (forward or backward)."""
    if row_mask is None:
        row_mask = jnp.ones((h.shape[0],), h.dtype)
    # pad batch rows to the f32 sublane multiple; padding rows carry w=0
    b = h.shape[0]
    b_pad = -(-b // 8) * 8
    if b_pad != b:
        h = jnp.pad(h, ((0, b_pad - b), (0, 0)))
        row_mask = jnp.pad(row_mask, (0, b_pad - b))
        label_idx = jnp.pad(label_idx, ((0, b_pad - b), (0, 0)),
                            constant_values=all_ent.shape[0])
    return _fused_core(h, all_ent, ent_bias, label_idx, row_mask,
                       float(smooth), interpret)
