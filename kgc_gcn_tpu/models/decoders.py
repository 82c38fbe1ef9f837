"""Scoring decoders: ConvE (reference parity) and DistMult (framework family).

Both return LOGITS over all entities; the reference applies a sigmoid at the
end of ConvE (model.py:179) but sigmoid is monotonic, so ranking is unchanged
and the loss uses the fused logits-space BCE (ops/losses.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kgc_gcn_tpu.config import Config
from kgc_gcn_tpu.models.common import (
    BNParams, BNState, batch_norm, bn_init, dropout,
    fan_in_bias_uniform, kaiming_uniform_torch, mm,
)


# ------------------------------------------------------------------------ ConvE

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ConvEParams:
    bn0: BNParams
    conv_w: jax.Array                  # (num_filter, 1, k, k) — OIHW
    conv_b: Optional[jax.Array]        # (num_filter,) iff cfg.bias
    bn1: BNParams
    fc_w: jax.Array                    # (gcn_out_dim, flat_sz) — torch (out, in)
    fc_b: jax.Array                    # (gcn_out_dim,)
    bn2: BNParams
    ent_bias: jax.Array                # (N,) per-entity score bias


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ConvEState:
    bn0: BNState
    bn1: BNState
    bn2: BNState


def conve_flat_size(cfg: Config) -> int:
    """(2*k_w - k + 1) * (k_h - k + 1) * num_filter (reference model.py:152-154)."""
    h = 2 * cfg.k_w - cfg.kernel_size + 1
    w = cfg.k_h - cfg.kernel_size + 1
    return h * w * cfg.num_filter


def conve_init(key: jax.Array, cfg: Config, n_ent: int) -> Tuple[ConvEParams, ConvEState]:
    if 2 * cfg.k_w * cfg.k_h != 2 * cfg.gcn_out_dim:
        raise ValueError(
            f"ConvE reshape needs k_w*k_h == gcn_out_dim, got "
            f"{cfg.k_w}*{cfg.k_h} != {cfg.gcn_out_dim}")
    kc, kcb, kf, kfb = jax.random.split(key, 4)
    flat = conve_flat_size(cfg)
    p0, s0 = bn_init(1)
    p1, s1 = bn_init(cfg.num_filter)
    p2, s2 = bn_init(cfg.gcn_out_dim)
    conv_shape = (cfg.num_filter, 1, cfg.kernel_size, cfg.kernel_size)
    params = ConvEParams(
        bn0=p0,
        conv_w=kaiming_uniform_torch(kc, conv_shape),
        conv_b=(fan_in_bias_uniform(kcb, cfg.num_filter,
                                    cfg.kernel_size * cfg.kernel_size)
                if cfg.bias else None),
        bn1=p1,
        fc_w=kaiming_uniform_torch(kf, (cfg.gcn_out_dim, flat)),
        fc_b=fan_in_bias_uniform(kfb, cfg.gcn_out_dim, flat),
        bn2=p2,
        ent_bias=jnp.zeros(n_ent),
    )
    return params, ConvEState(bn0=s0, bn1=s1, bn2=s2)


def _conv2d_c1_im2col(x: jax.Array, w: jax.Array, compute_dtype: str) -> jax.Array:
    """VALID stride-1 conv for a SINGLE input channel as im2col + MXU matmul.

    ``lax.conv_general_dilated`` with C_in=1 NCHW gets a pathological TPU
    layout (channel-minor ``T(1,128)`` tiling); its transpose (backward) was
    the single most expensive op of the whole training step (1.4 ms at
    reference shapes — more than both Pallas SpMM halves combined).  The
    K*K=49 static shifted slices + one ``(B*OH*OW, K²) @ (K², F)`` matmul
    compute the same sums with clean layouts, and the autodiff transpose is
    dense pad/add + a matmul.

    x: (B, 1, H, W); w: (F, 1, K, K) OIHW  →  (B, F, H-K+1, W-K+1).
    """
    b, _, hh, ww = x.shape
    f, _, k, _ = w.shape
    oh, ow = hh - k + 1, ww - k + 1
    xs = x[:, 0]
    cols = jnp.stack(
        [xs[:, i:i + oh, j:j + ow] for i in range(k) for j in range(k)],
        axis=-1)                                       # (B, OH, OW, K*K)
    return _patches_matmul(cols.reshape(b * oh * ow, k * k), w,
                           (b, oh, ow), compute_dtype)


def _patches_matmul(patches, w, bohow, compute_dtype):
    """(B*OH*OW, K*K) patches @ (K*K, F) filters → NCHW output (shared tail
    of the im2col and conv_general_dilated_patches lowerings)."""
    b, oh, ow = bohow
    f = w.shape[0]
    wmat = w.reshape(f, -1).T                          # (K*K, F)
    out = mm(patches, wmat, compute_dtype)             # (B*OH*OW, F)
    return out.reshape(b, oh, ow, f).transpose(0, 3, 1, 2)


def conve_query(
    params: ConvEParams,
    state: ConvEState,
    cfg: Config,
    src_emb: jax.Array,    # (B, gcn_out_dim)
    rel_emb: jax.Array,    # (B, gcn_out_dim)
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, ConvEState]:
    """Decoder trunk: query vector h (B, gcn_out_dim) before entity scoring.

    Reference model.py:159-175, in logits space.  Image layout is bit-identical
    to the reference: stack (B,2,d), transpose to (B,d,2) and row-major reshape
    to (B,1,2*k_w,k_h) — i.e. src/rel feature pairs interleaved along rows
    (model.py:161-164).
    """
    rngs = rngs or {}
    b = src_emb.shape[0]
    stack = jnp.stack([src_emb, rel_emb], axis=1)            # (B, 2, d)
    img = jnp.transpose(stack, (0, 2, 1)).reshape(
        b, 1, 2 * cfg.k_w, cfg.k_h)

    x, ns0 = batch_norm(img, params.bn0, state.bn0, train=train, channel_axis=1)
    if cfg.conv_impl == "im2col":
        x = _conv2d_c1_im2col(x, params.conv_w, cfg.compute_dtype)
    elif cfg.conv_impl == "patches":
        # same im2col algebra with the patch extraction done by XLA's
        # conv_general_dilated_patches instead of 49 stacked slices
        b2, _, hh, ww = x.shape
        kk = params.conv_w.shape[2]
        oh, ow = hh - kk + 1, ww - kk + 1
        p = jax.lax.conv_general_dilated_patches(
            x, (kk, kk), (1, 1), "VALID")              # (B, k*k, OH, OW)
        x = _patches_matmul(
            p.transpose(0, 2, 3, 1).reshape(b2 * oh * ow, kk * kk),
            params.conv_w, (b2, oh, ow), cfg.compute_dtype)
    else:
        conv_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                      else params.conv_w.dtype)
        # same-dtype in/out keeps the conv VJP well-typed; upcast after
        x = jax.lax.conv_general_dilated(
            x.astype(conv_dtype), params.conv_w.astype(conv_dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW")).astype(jnp.float32)
    if params.conv_b is not None:
        x = x + params.conv_b[None, :, None, None]
    x, ns1 = batch_norm(x, params.bn1, state.bn1, train=train, channel_axis=1)
    x = jax.nn.relu(x)
    x = dropout(x, cfg.feat_drop, rngs.get("feat"), train)
    x = x.reshape(b, -1)                                     # (B, flat)
    x = mm(x, params.fc_w.T, cfg.compute_dtype) + params.fc_b
    x = dropout(x, cfg.hidden_drop, rngs.get("hidden"), train)
    x, ns2 = batch_norm(x, params.bn2, state.bn2, train=train, channel_axis=-1)
    x = jax.nn.relu(x)
    return x, ConvEState(bn0=ns0, bn1=ns1, bn2=ns2)


def conve_apply(
    params: ConvEParams,
    state: ConvEState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    all_ent: jax.Array,    # (N, gcn_out_dim)
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, ConvEState]:
    """Full 1-vs-all scoring: trunk + B x d x N matmul (reference model.py:177-178)."""
    h, new_state = conve_query(params, state, cfg, src_emb, rel_emb,
                               train=train, rngs=rngs)
    logits = mm(h, all_ent.T, cfg.compute_dtype) + params.ent_bias[None, :]
    return logits, new_state


def conve_score_candidates(
    params: ConvEParams,
    state: ConvEState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    cand_emb: jax.Array,   # (B, K, gcn_out_dim) candidate entity embeddings
    cand_idx: jax.Array,   # (B, K) candidate entity ids (for the bias)
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, ConvEState]:
    """Score only K sampled candidates per query (negative-sampling training)."""
    h, new_state = conve_query(params, state, cfg, src_emb, rel_emb,
                               train=train, rngs=rngs)
    logits = jnp.einsum("bd,bkd->bk", h, cand_emb,
                        preferred_element_type=jnp.float32)
    return logits + params.ent_bias[cand_idx], new_state


# --------------------------------------------------------------------- DistMult

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistMultParams:
    ent_bias: jax.Array    # (N,)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistMultState:
    pass


def distmult_init(key: jax.Array, cfg: Config, n_ent: int
                  ) -> Tuple[DistMultParams, DistMultState]:
    del key
    return DistMultParams(ent_bias=jnp.zeros(n_ent)), DistMultState()


def distmult_apply(
    params: DistMultParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    all_ent: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    """score(s, r, o) = <e_s * w_r, e_o> + b_o, batched as one MXU matmul."""
    del rngs
    logits = mm(src_emb * rel_emb, all_ent.T, cfg.compute_dtype) \
        + params.ent_bias[None, :]
    return logits, state


def distmult_score_candidates(
    params: DistMultParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    cand_emb: jax.Array,
    cand_idx: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    logits = jnp.einsum("bd,bkd->bk", src_emb * rel_emb, cand_emb,
                        preferred_element_type=jnp.float32)
    return logits + params.ent_bias[cand_idx], state


# ---------------------------------------------------------------------- TransE

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TransEParams:
    ent_bias: jax.Array    # (N,) — kept for API uniformity (init zeros)


def transe_init(key: jax.Array, cfg: Config, n_ent: int
                ) -> Tuple[TransEParams, DistMultState]:
    del key
    return TransEParams(ent_bias=jnp.zeros(n_ent)), DistMultState()


def transe_apply(
    params: TransEParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    all_ent: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    """score(s, r, o) = -||e_s + w_r - e_o||^2 + b_o (squared-L2 TransE).

    Expanded to matmul form for the MXU: -||q||^2 + 2 q·e_o - ||e_o||^2 with
    q = e_s + w_r — one (B, d) x (d, N) matmul plus rank-1 row/column terms
    instead of a (B, N, d) broadcast difference.
    """
    del rngs
    q = src_emb + rel_emb                                   # (B, d)
    cross = mm(q, all_ent.T, cfg.compute_dtype)             # (B, N)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)              # (B, 1)
    o2 = jnp.sum(all_ent * all_ent, axis=1)[None, :]        # (1, N)
    return 2.0 * cross - q2 - o2 + params.ent_bias[None, :], state


def transe_score_candidates(
    params: TransEParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    cand_emb: jax.Array,
    cand_idx: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    q = src_emb + rel_emb
    diff = q[:, None, :] - cand_emb                         # (B, K, d)
    logits = -jnp.sum(diff * diff, axis=-1)
    return logits + params.ent_bias[cand_idx], state


# --------------------------------------------------------------------- ComplEx

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ComplExParams:
    ent_bias: jax.Array    # (N,)


def complex_init(key: jax.Array, cfg: Config, n_ent: int
                 ) -> Tuple[ComplExParams, DistMultState]:
    del key
    if cfg.gcn_out_dim % 2:
        raise ValueError("ComplEx needs an even gcn_out_dim (re/im split), "
                         f"got {cfg.gcn_out_dim}")
    return ComplExParams(ent_bias=jnp.zeros(n_ent)), DistMultState()


def _complex_query_vec(src_emb: jax.Array, rel_emb: jax.Array) -> jax.Array:
    """h such that score = h @ all_ent.T: ComplEx Re(<s, r, conj(o)>) with the
    encoder's d_out split into (re | im) halves.

    h_re = s_re*r_re - s_im*r_im, h_im = s_re*r_im + s_im*r_re (complex
    product s*r); the score is then the real inner product with (o_re | o_im).
    """
    d = src_emb.shape[1] // 2
    s_re, s_im = src_emb[:, :d], src_emb[:, d:]
    r_re, r_im = rel_emb[:, :d], rel_emb[:, d:]
    return jnp.concatenate(
        [s_re * r_re - s_im * r_im, s_re * r_im + s_im * r_re], axis=1)


def complex_apply(
    params: ComplExParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    all_ent: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    h = _complex_query_vec(src_emb, rel_emb)
    logits = mm(h, all_ent.T, cfg.compute_dtype) + params.ent_bias[None, :]
    return logits, state


def complex_score_candidates(
    params: ComplExParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    cand_emb: jax.Array,
    cand_idx: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    h = _complex_query_vec(src_emb, rel_emb)
    logits = jnp.einsum("bd,bkd->bk", h, cand_emb,
                        preferred_element_type=jnp.float32)
    return logits + params.ent_bias[cand_idx], state


# ---------------------------------------------------------------------- RotatE

def rotate_init(key: jax.Array, cfg: Config, n_ent: int
                ) -> Tuple[TransEParams, DistMultState]:
    del key
    if cfg.gcn_out_dim % 2:
        raise ValueError("RotatE needs an even gcn_out_dim (re/im split), "
                         f"got {cfg.gcn_out_dim}")
    return TransEParams(ent_bias=jnp.zeros(n_ent)), DistMultState()


def _rotate_query_vec(src_emb: jax.Array, rel_emb: jax.Array) -> jax.Array:
    """q = s ∘ e^{iθ}: rotate the complex entity embedding (re | im halves)
    by per-dimension phases θ read from the encoder's relation output (its
    first d/2 dims; unconstrained reals — sin/cos make them periodic, the
    RotatE unit-modulus constraint |r|=1 holds by construction)."""
    d = src_emb.shape[1] // 2
    s_re, s_im = src_emb[:, :d], src_emb[:, d:]
    theta = rel_emb[:, :d]
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.concatenate([s_re * c - s_im * s, s_re * s + s_im * c], axis=1)


def rotate_apply(
    params: TransEParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    all_ent: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    """score(s, r, o) = -||s ∘ r - e_o||^2 + b_o, |r| = 1 (squared-L2 RotatE).

    Like TransE, expanded to matmul form for the MXU: -||q||^2 + 2 q·e_o
    - ||e_o||^2 with q the rotated subject — one (B, d) x (d, N) matmul plus
    rank-1 row/column terms instead of a (B, N, d) broadcast difference.
    Distance-based (column term -||e_o||^2), so like TransE it has no query
    trunk and one-vs-all training uses the dense loss path.
    """
    del rngs
    q = _rotate_query_vec(src_emb, rel_emb)                 # (B, d)
    cross = mm(q, all_ent.T, cfg.compute_dtype)             # (B, N)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)              # (B, 1)
    o2 = jnp.sum(all_ent * all_ent, axis=1)[None, :]        # (1, N)
    return 2.0 * cross - q2 - o2 + params.ent_bias[None, :], state


def rotate_score_candidates(
    params: TransEParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    cand_emb: jax.Array,
    cand_idx: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    q = _rotate_query_vec(src_emb, rel_emb)
    diff = q[:, None, :] - cand_emb                         # (B, K, d)
    logits = -jnp.sum(diff * diff, axis=-1)
    return logits + params.ent_bias[cand_idx], state


def complex_query(
    params: ComplExParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    return _complex_query_vec(src_emb, rel_emb), state


def distmult_query(
    params: DistMultParams,
    state: DistMultState,
    cfg: Config,
    src_emb: jax.Array,
    rel_emb: jax.Array,
    *,
    train: bool,
    rngs: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, DistMultState]:
    del rngs
    return src_emb * rel_emb, state


DECODERS = {
    "conve": (conve_init, conve_apply),
    "distmult": (distmult_init, distmult_apply),
    "transe": (transe_init, transe_apply),
    "complex": (complex_init, complex_apply),
    "rotate": (rotate_init, rotate_apply),
}

# decoder trunks producing the query vector h such that
# logits = h @ all_ent.T + ent_bias — lets the trainer fuse the scoring
# matmul with the BCE loss (ops/fused_loss.py) instead of materializing the
# (B, N) logits.  TransE is distance-based (score has a -||e_o||^2 column
# term AND a -||q||^2 row term) so it has no trunk and the trainer falls
# back to the dense loss.
QUERY_TRUNKS = {
    "conve": conve_query,
    "distmult": distmult_query,
    "complex": complex_query,
}

CANDIDATE_SCORERS = {
    "conve": conve_score_candidates,
    "distmult": distmult_score_candidates,
    "transe": transe_score_candidates,
    "complex": complex_score_candidates,
    "rotate": rotate_score_candidates,
}
