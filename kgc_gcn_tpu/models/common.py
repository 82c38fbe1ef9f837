"""Shared model building blocks: initializers, BatchNorm, dropout.

All functional — parameters and mutable statistics are plain pytrees, so the
whole model jits/pjits cleanly.  Semantics deliberately match torch where the
reference relies on them:

  * ``xavier_uniform``: bound ``sqrt(6/(fan_in+fan_out))`` with torch's 2-D fan
    convention ``fan_in = shape[1], fan_out = shape[0]`` (reference
    utils.py:113-118 applies this to every embedding/weight).
  * BatchNorm: torch eps 1e-5, momentum 0.1; normalization uses the BIASED
    batch variance, the running-var update uses the UNBIASED one; eval mode
    uses running statistics (reference model.py:56,137-139).
  * Dropout: inverted scaling ``kept / (1 - p)`` during training.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- initializers

def xavier_uniform(key: jax.Array, shape: Tuple[int, ...],
                   dtype=jnp.float32) -> jax.Array:
    fan_in = int(np.prod(shape[1:]))
    fan_out = shape[0] * (int(np.prod(shape[2:])) if len(shape) > 2 else 1)
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform_torch(key: jax.Array, shape: Tuple[int, ...],
                          dtype=jnp.float32) -> jax.Array:
    """torch's default Linear/Conv2d weight init (kaiming_uniform, a=sqrt(5)).

    For weight shape (out, in, *rf): bound = 1/sqrt(fan_in).
    """
    fan_in = int(np.prod(shape[1:]))
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def fan_in_bias_uniform(key: jax.Array, size: int, fan_in: int,
                        dtype=jnp.float32) -> jax.Array:
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(key, (size,), dtype, minval=-bound, maxval=bound)


# ------------------------------------------------------------------- BatchNorm

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BNParams:
    scale: jax.Array   # gamma (C,)
    bias: jax.Array    # beta (C,)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BNState:
    mean: jax.Array    # running mean (C,)
    var: jax.Array     # running var (C,), unbiased


def bn_init(c: int) -> Tuple[BNParams, BNState]:
    return (BNParams(scale=jnp.ones(c), bias=jnp.zeros(c)),
            BNState(mean=jnp.zeros(c), var=jnp.ones(c)))


def batch_norm(
    x: jax.Array,
    params: BNParams,
    state: BNState,
    *,
    train: bool,
    channel_axis: int = -1,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, BNState]:
    """Functional BatchNorm over all axes except ``channel_axis``."""
    axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)
    shape = [1] * x.ndim
    shape[channel_axis % x.ndim] = x.shape[channel_axis]

    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean.reshape(shape)), axis=axes)
        n = float(np.prod([x.shape[i] for i in axes]))
        unbiased = var * (n / max(n - 1.0, 1.0))
        new_state = BNState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var, new_state = state.mean, state.var, state

    inv = jax.lax.rsqrt(var.reshape(shape) + eps)
    y = (x - mean.reshape(shape)) * inv
    return y * params.scale.reshape(shape) + params.bias.reshape(shape), new_state


# ---------------------------------------------------------------- mixed matmul

def mm(a: jax.Array, b: jax.Array, compute_dtype: str = "float32") -> jax.Array:
    """``a @ b`` with optional bf16 operand casting, f32 accumulation.

    With ``compute_dtype='bfloat16'`` the operands are cast to bf16 before the
    MXU (half the HBM traffic, full-rate MXU passes) and accumulated in f32 —
    the standard TPU mixed-precision recipe.  Parameters stay f32.
    """
    if compute_dtype == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


# --------------------------------------------------------------------- dropout

def dropout(x: jax.Array, rate: float, key: Optional[jax.Array],
            train: bool) -> jax.Array:
    if not train or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def init_embeddings_from_npz(params, path: str):
    """Warm-start embedding tables from an ``.npz`` (framework extension).

    Recognized keys: ``entity_embedding`` (N, gcn_in_dim) and
    ``relation_embedding`` (2R, d) — the PARAMETER tables (not the encoder
    outputs that ``serve.Predictor.export_tables`` writes).  Shapes must
    match exactly; at least one key must apply.  Returns params with the
    matching leaves replaced.
    """
    import numpy as np

    data = np.load(path, allow_pickle=False)
    updates = {}
    for key in ("entity_embedding", "relation_embedding"):
        if key not in data.files:
            continue
        if not hasattr(params, key):
            raise ValueError(f"{key!r} in {path} but this model family has "
                             "no such parameter")
        cur = getattr(params, key)
        arr = np.asarray(data[key], np.float32)
        if arr.shape != tuple(cur.shape):
            raise ValueError(
                f"{key} shape {arr.shape} != model shape {tuple(cur.shape)}"
                f" (is this an export_tables file? those hold ENCODED"
                f" tables, not parameters)")
        updates[key] = jnp.asarray(arr)
    if not updates:
        raise ValueError(
            f"{path} has none of entity_embedding/relation_embedding "
            f"(found: {sorted(data.files)})")
    return dataclasses.replace(params, **updates)
