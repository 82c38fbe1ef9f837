"""Training losses.

The reference computes ``BCELoss(sigmoid(x), y)`` — a sigmoid followed by a
probability-space BCE (reference model.py:22,179; main.py:62), which is
numerically fragile (log of a saturated sigmoid).  We keep the model in logits
space and use the standard fused, stable formulation; the two are
mathematically identical:

    BCE(sigmoid(x), y) = max(x, 0) - x*y + log(1 + exp(-|x|))

Row masking supports padded final batches: torch's mean is over all B*N
elements (main.py:62), so the masked mean divides by ``valid_rows * N``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _bce_core(logits: jax.Array, targets: jax.Array,
              row_mask: jax.Array) -> jax.Array:
    per = (jnp.maximum(logits, 0.0) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    w = row_mask[:, None]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * per.shape[1]
    return jnp.sum(per * w) / denom


def _bce_fwd(logits, targets, row_mask):
    return _bce_core(logits, targets, row_mask), (logits, targets, row_mask)


def _bce_bwd(res, g):
    # d/dlogits of BCE-with-logits is just sigmoid(x) - y: one fused
    # elementwise pass instead of autodiff's max/log1p/abs chain over the
    # (B, N) score matrix — the largest activation in the model.
    logits, targets, row_mask = res
    w = row_mask[:, None]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * logits.shape[1]
    scale = g / denom
    d_logits = (jax.nn.sigmoid(logits) - targets) * w * scale
    d_targets = -logits * w * scale
    return d_logits, d_targets, None


_bce_core.defvjp(_bce_fwd, _bce_bwd)


def bce_with_logits(
    logits: jax.Array,               # (B, N)
    targets: jax.Array,              # (B, N) in [0, 1]
    row_mask: Optional[jax.Array] = None,  # (B,) 1.0 valid / 0.0 padding
) -> jax.Array:
    if row_mask is None:
        row_mask = jnp.ones((logits.shape[0],), logits.dtype)
    return _bce_core(logits, targets, row_mask)


def margin_ranking_loss(
    pos_scores: jax.Array,   # (B,)
    neg_scores: jax.Array,   # (B, K)
    margin: float = 1.0,
    row_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Hinge loss for negative-sampling training (framework extension)."""
    per = jnp.maximum(0.0, margin - pos_scores[:, None] + neg_scores)
    if row_mask is None:
        return jnp.mean(per)
    w = row_mask[:, None]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * per.shape[1]
    return jnp.sum(per * w) / denom


def self_adversarial_loss(
    pos_logits: jax.Array,   # (B,)
    neg_logits: jax.Array,   # (B, K)
    margin: float = 1.0,
    temperature: float = 1.0,
    row_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Self-adversarial negative-sampling loss (RotatE, Sun et al. 2019).

    ``-log σ(γ + s_pos) - Σ_k p_k · log σ(-s_k - γ)`` with the negative
    weights ``p_k = softmax(α · s_k)`` treated as constants (stop-gradient):
    harder negatives get more weight, without feeding the weighting itself
    back into the gradient.  Framework extension — the reference trains
    1-vs-all only (main.py:61-62).
    """
    w = jax.lax.stop_gradient(
        jax.nn.softmax(temperature * neg_logits, axis=1))      # (B, K)
    per = (jax.nn.softplus(-(margin + pos_logits))             # -log σ(γ+s⁺)
           + jnp.sum(w * jax.nn.softplus(neg_logits + margin), axis=1))
    if row_mask is None:
        return jnp.mean(per)
    return jnp.sum(per * row_mask) / jnp.maximum(jnp.sum(row_mask), 1.0)


def sampled_bce_with_logits(
    pos_logits: jax.Array,   # (B,)
    neg_logits: jax.Array,   # (B, K)
    row_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """BCE over one positive + K sampled negatives per query."""
    logits = jnp.concatenate([pos_logits[:, None], neg_logits], axis=1)
    targets = jnp.zeros_like(logits).at[:, 0].set(1.0)
    return bce_with_logits(logits, targets, row_mask)
