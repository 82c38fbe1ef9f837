"""On-device edge sampling for stochastic subgraph training
(BASELINE.json config 4).

The reference trains full-graph only: every minibatch re-encodes all 2E+N
edges (reference model.py:99-101, SURVEY.md §2.2).  For graphs that don't fit
— or to trade variance for throughput — this module subsamples the edge list
INSIDE the jitted step: static sample size K, uniform-with-replacement draws
via ``jax.random.randint`` (no host RNG, no dynamic shapes), messages rescaled
by ``E/K`` so the aggregated neighborhood sum stays unbiased:

    E[ (E/K) * sum_{k<K} m_{e_k} ] = sum_e m_e.

Sampling with replacement keeps shapes static and is the standard estimator
(GraphSAGE-style edge sampling); duplicates are simply counted twice.  The
sampled half is NOT dst-sorted, so aggregation falls back to XLA's unsorted
segment-sum — worth it only when K << E.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kgc_gcn_tpu.data.graph import GraphHalf


def sample_half(key: jax.Array, half: GraphHalf, num_samples: int,
                n_edge_real: int) -> GraphHalf:
    """Uniformly sample ``num_samples`` edges (with replacement) from the
    real (unpadded) edges of a half; norms are rescaled by E/K.

    The returned half's ``eid`` holds the sampled POSITIONS within the half
    (real edges occupy positions ``[0, e_real)``), which index the half's
    positional edge-embedding slice directly (see models/mgcn.py layout).
    """
    idx = jax.random.randint(key, (num_samples,), 0, n_edge_real)
    scale = jnp.float32(n_edge_real) / jnp.float32(num_samples)
    return GraphHalf(
        src=half.src[idx],
        dst=half.dst[idx],
        rel=half.rel[idx],
        eid=idx,
        norm=half.norm[idx] * scale,
        indptr=half.indptr,       # NOT valid for the sample; unused by the
        sperm=half.sperm,         # unsorted segment-sum path
        s_indptr=half.s_indptr,
        s_src=half.s_src,
        s_dst=half.s_dst,
        s_norm=half.s_norm,
        s_rel=half.s_rel,
        rperm=half.rperm,
        r_indptr=half.r_indptr,
        r_rel=half.r_rel,
        e_real=half.e_real,
    )


def aggregate_sampled_half(
    x: jax.Array,
    rel_all: jax.Array,
    etab: jax.Array,      # (E_pad, d) this half's positional embedding slice
    half: GraphHalf,      # a sampled half from ``sample_half``
    n_ent: int,
) -> jax.Array:
    """Compose + unsorted scatter-add for a sampled (unsorted) half."""
    msg = (x[half.src] * rel_all[half.rel] * etab[half.eid]) \
        * half.norm[:, None]
    return jax.ops.segment_sum(msg, half.dst, num_segments=n_ent)
