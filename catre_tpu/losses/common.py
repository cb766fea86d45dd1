"""Elementwise loss primitives with masked-batch reductions.

Padded instance batches are first-class on TPU (static shapes), so every
reduction here is a masked mean over valid samples; with an all-ones mask the
values equal the reference's unpadded means.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(per_sample: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Mean of per-sample scalars over valid entries. mask: (B,) float/bool."""
    if mask is None:
        return jnp.mean(per_sample)
    m = mask.astype(per_sample.dtype)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1(pred, target):
    return jnp.abs(pred - target)


def mse(pred, target):
    return jnp.square(pred - target)


def smooth_l1(pred, target, beta: float = 1.0):
    """fvcore smooth_l1_loss semantics (used by PM_LOSS_TYPE='Smooth_L1')."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def l2_norm_per_sample(pred, target):
    """Reference L2Loss (`losses/l2_loss.py:5-38`): per-sample L2 norm of the
    flattened difference (not squared)."""
    d = (pred - target).reshape(pred.shape[0], -1)
    return jnp.linalg.norm(d, axis=1)


def elementwise(loss_type: str, beta: float = 1.0):
    lt = loss_type.lower()
    if lt == "l1":
        return l1
    if lt == "mse":
        return mse
    if lt == "smooth_l1":
        return lambda p, t: smooth_l1(p, t, beta)
    raise ValueError(f"unsupported elementwise loss type: {loss_type}")
