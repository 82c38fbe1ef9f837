"""Query banks and batching.

The reference builds the dense multi-hot label for every sample in Python
inside DataLoader workers — an O(N) loop per sample (reference
data_loader.py:47-51) that is its CPU bottleneck.  Here labels live on device
as a padded index matrix ``(Q, L_max)`` (pad value = N, dropped by the scatter)
and the multi-hot + label smoothing (data_loader.py:41-43) is a one-line
scatter inside the jitted step.  Batch order is the only thing the host
produces: a shuffled ``(steps, B)`` index array per epoch.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kgc_gcn_tpu.data.dataset import KGDataset


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QueryBank:
    """Device-resident queries + padded label indices for one split."""

    queries: jax.Array     # int32 (Q, 2) train (s, r) | (Q, 3) eval (s, r, o)
    label_idx: jax.Array   # int32 (Q, L_max), padded with n_ent
    n_queries: int = _static(default=0)
    n_ent: int = _static(default=0)

    @property
    def label_width(self) -> int:
        return int(self.label_idx.shape[1])


def _pad_labels(labels, n_ent: int, width_to: int = 8) -> np.ndarray:
    """Padded (Q, L_max) label-index matrix (pad value n_ent).

    CSR ``LabelSet`` input (data/dataset.py) takes the vectorized scatter
    path; a plain list of lists takes the python loop."""
    from kgc_gcn_tpu.data.dataset import LabelSet
    if isinstance(labels, LabelSet):
        lens = np.diff(labels.offsets)
        lmax = int(lens.max()) if len(lens) else 1
        lmax = max(width_to, -(-max(lmax, 1) // width_to) * width_to)
        out = np.full((len(lens), lmax), n_ent, dtype=np.int32)
        rows = np.repeat(np.arange(len(lens)), lens)
        cols = (np.arange(len(labels.values), dtype=np.int64)
                - np.repeat(labels.offsets[:-1], lens))
        out[rows, cols] = labels.values
        return out
    lmax = max((len(l) for l in labels), default=1)
    lmax = max(width_to, -(-lmax // width_to) * width_to)
    out = np.full((len(labels), lmax), n_ent, dtype=np.int32)
    for i, l in enumerate(labels):
        out[i, : len(l)] = l
    return out


def make_query_bank(queries: np.ndarray, labels, n_ent: int) -> QueryBank:
    return QueryBank(
        queries=jnp.asarray(queries, jnp.int32),
        label_idx=jnp.asarray(_pad_labels(labels, n_ent), jnp.int32),
        n_queries=int(len(queries)),
        n_ent=n_ent,
    )


def make_banks(ds: KGDataset) -> Dict[str, QueryBank]:
    """Banks for train + the four eval splits (reference data_loader.py:180-192)."""
    banks = {"train": make_query_bank(ds.train_queries, ds.train_labels, ds.num_entity)}
    for key, eq in ds.eval_queries.items():
        banks[key] = make_query_bank(eq.triples, eq.labels, ds.num_entity)
    return banks


def epoch_batches(
    n_queries: int,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffled, padded batch plan for one epoch.

    Returns ``(idx, mask)``: ``idx`` int32 (steps, B) indices into the query
    bank, ``mask`` float32 (steps, B) with 0.0 on padding rows.  The reference
    uses shuffle=True, drop_last=False for all five loaders
    (data_loader.py:186-191); the partial final batch is padded and masked so
    every step has a static shape.
    """
    order = rng.permutation(n_queries) if shuffle else np.arange(n_queries)
    steps = -(-n_queries // batch_size)
    total = steps * batch_size
    idx = np.zeros(total, dtype=np.int32)
    idx[:n_queries] = order
    mask = np.zeros(total, dtype=np.float32)
    mask[:n_queries] = 1.0
    return idx.reshape(steps, batch_size), mask.reshape(steps, batch_size)


def build_labels(
    label_idx: jax.Array, n_ent: int, smooth: float = 0.0
) -> jax.Array:
    """Multi-hot labels from padded indices, with label smoothing, on device.

    Matches reference data_loader.py:47-51 (multi-hot) and :41-43 (smoothing
    ``y = (1 - eps) * y + 1/N``).  Pad entries equal ``n_ent`` and are dropped.
    """
    b = label_idx.shape[0]
    y = jnp.zeros((b, n_ent), jnp.float32)
    y = y.at[jnp.arange(b)[:, None], label_idx].set(1.0, mode="drop")
    if smooth:
        y = (1.0 - smooth) * y + 1.0 / n_ent
    return y
