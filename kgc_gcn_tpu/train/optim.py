"""Optimizer: Adam + global-norm clipping + stepped lr decay.

Matches the reference training rule exactly (reference main.py:69-71,217-219):
clip_grad_norm_(1.0) BEFORE the update, Adam(lr, weight_decay) with torch
semantics (weight decay added to the clipped gradient), and
``StepLR(step_size=10, gamma=0.995)`` stepped once per epoch.

The learning rate is a per-epoch host scalar passed into the jitted step (so
the step compiles once), computed by ``epoch_lr``.
"""

from __future__ import annotations

import jax
import optax

from kgc_gcn_tpu.config import Config


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """lr-less transform; the caller scales updates by the per-epoch lr."""
    parts = []
    if cfg.clip_grad and cfg.clip_grad > 0:
        parts.append(optax.clip_by_global_norm(cfg.clip_grad))
    if cfg.weight_decay and cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)


def epoch_lr(cfg: Config, epoch: int) -> float:
    """lr for epoch (1-based): base * gamma^floor((epoch-1)/step_size).

    torch StepLR stepped after each epoch (reference main.py:152,219): epochs
    1..10 run at base lr, 11..20 at base*gamma, etc.
    """
    return cfg.learning_rate * cfg.lr_gamma ** ((epoch - 1) // cfg.lr_step_size)


def apply_updates_with_lr(params, updates, lr):
    """params - lr * adam_updates (sign folded here; transform is lr-less)."""
    scaled = jax.tree.map(lambda u: -lr * u, updates)
    return optax.apply_updates(params, scaled)
