"""Filtered ranking and link-prediction metrics, fully on device.

The reference ranks with a double argsort over the ``(B, N)`` score matrix —
``1 + argsort(argsort(pred, desc), asc)[b, obj]`` (reference main.py:122-126)
— an ``O(N log N)`` sort per row.  On TPU the rank of one known target needs
no sort at all: it is a comparison count,

    rank = 1 + #{ e : masked_score[e] > score[obj] },

an ``O(N)`` VPU reduction that XLA fuses with the masking.  The two agree
whenever scores are distinct; under exact float ties torch's (unstable)
argsort places the target arbitrarily, while the comparison count is the
optimistic rank — the standard convention.

Filtering matches main.py:123-125: score the target, push every known-true
entity to -inf (reference uses -1e7), restore the target.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def filtered_ranks(
    scores: jax.Array,       # (B, N) — any monotonic score (logits are fine)
    obj: jax.Array,          # (B,) gold entity
    filter_idx: jax.Array,   # (B, L) known-true entities, padded with N
) -> jax.Array:
    b = scores.shape[0]
    rows = jnp.arange(b)
    target = scores[rows, obj]
    masked = scores.at[rows[:, None], filter_idx].set(-jnp.inf, mode="drop")
    ranks = 1 + jnp.sum(masked > target[:, None], axis=1)
    return ranks


def rank_metrics(
    ranks: jax.Array,                 # (B,) int
    row_mask: jax.Array,              # (B,) 1.0 valid / 0.0 padding
    hits_at: int = 10,
) -> Dict[str, jax.Array]:
    """Partial sums for one batch (reference main.py:129-133).

    Keys: count, mr, mrr, hits@1..hits@{hits_at} — all SUMS, to be combined
    across tail/head passes as in reference main.py:91-97.
    """
    r = ranks.astype(jnp.float32)
    out = {
        "count": jnp.sum(row_mask),
        "mr": jnp.sum(r * row_mask),
        "mrr": jnp.sum(row_mask / r),
    }
    for k in range(1, hits_at + 1):
        out[f"hits@{k}"] = jnp.sum(jnp.where(r <= k, row_mask, 0.0))
    return out


def combine_head_tail(
    tail: Dict[str, float], head: Dict[str, float], hits: Sequence[int] = (1, 3, 10)
) -> Dict[str, float]:
    """Average tail- and head-direction sums (reference main.py:84-97)."""
    count = float(tail["count"])
    res = {
        "mr": round((float(tail["mr"]) + float(head["mr"])) / (2 * count), 5),
        "mrr": round((float(tail["mrr"]) + float(head["mrr"])) / (2 * count), 5),
    }
    for k in hits:
        res[f"hits@{k}"] = round(
            (float(tail[f"hits@{k}"]) + float(head[f"hits@{k}"])) / (2 * count), 5)
    return res


def rank_metric_sums_by_rel(
    ranks: jax.Array,        # (B,) int
    rels: jax.Array,         # (B,) relation ids in [0, 2R) — reverse folds
    row_mask: jax.Array,     # (B,) 1.0 valid / 0.0 padding
    num_rels: int,           # R (forward count)
    hits_at: Sequence[int] = (1, 3, 10),
) -> Dict[str, jax.Array]:
    """Per-relation partial sums: the same quantities as ``rank_metrics``,
    segment-summed over the FORWARD relation id (``rel % R``, so the head
    direction's reverse relations fold onto their forward relation —
    framework extension; the reference only reports corpus-level metrics)."""
    r = ranks.astype(jnp.float32)
    seg = (rels % num_rels).astype(jnp.int32)

    def s(x):
        return jax.ops.segment_sum(x, seg, num_segments=num_rels)

    out = {"count": s(row_mask), "mr": s(r * row_mask), "mrr": s(row_mask / r)}
    for k in hits_at:
        out[f"hits@{k}"] = s(jnp.where(r <= k, row_mask, 0.0))
    return out


def combine_head_tail_by_rel(
    tail: Dict[str, jax.Array], head: Dict[str, jax.Array],
    hits: Sequence[int] = (1, 3, 10),
) -> Dict[str, "jax.Array"]:
    """Per-relation analog of ``combine_head_tail``: average the two
    directions' sums, guarding relations with no eval queries (count 0)."""
    import numpy as np

    count = np.asarray(tail["count"])
    denom = np.maximum(2.0 * count, 1.0)
    out = {"count": count}
    for k in ("mr", "mrr", *(f"hits@{k}" for k in hits)):
        out[k] = np.where(
            count > 0,
            (np.asarray(tail[k]) + np.asarray(head[k])) / denom,
            np.nan)
    return out


def corpus_from_per_rel(
    per: Dict[str, "jax.Array"], hits: Sequence[int] = (1, 3, 10),
) -> Dict[str, float]:
    """Corpus-level metrics from the per-relation table — exact, because the
    corpus metrics are the count-weighted mean of the per-relation ones
    (pinned by tests/test_train.py): lets ``--per_relation`` report both from
    ONE ranking pass instead of evaluating the test set twice."""
    import numpy as np

    c = np.asarray(per["count"], np.float64)
    total = max(float(c.sum()), 1.0)
    out = {}
    for k in ("mr", "mrr", *(f"hits@{h}" for h in hits)):
        v = np.where(c > 0, np.nan_to_num(np.asarray(per[k])), 0.0)
        out[k] = round(float((v * c).sum() / total), 5)
    return out
