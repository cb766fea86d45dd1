"""Ranger optimizer (RAdam + Lookahead + Gradient Centralization) in optax.

Behavioral reference: `lib/torch_utils/solver/ranger.py:31-202` (the shipped
optimizer, `configs/...120e.py:49`).  Faithful semantics:

  - GC is applied to any gradient whose *torch* weight has ndim > 1 — i.e.
    conv and fc kernels — by subtracting the mean over all non-output axes.
    flax kernels are (in..., out) with the torch output axis LAST, so GC here
    subtracts the mean over all axes except the last.  The rot head's
    `point_weight` is stored flat (P,) but corresponds to a torch Conv1d
    weight (1, P, 1), so it is centralized over all elements; the name-based
    exception handles this.
  - RAdam rectification with N_sma_threshold=5, betas=(0.95, 0.999), eps=1e-5.
  - Lookahead at the parameter level: every k=6 steps the slow buffer moves
    alpha=0.5 toward the fast weights and the fast weights snap to it.
  - Weight decay is decoupled multiplicative (p -= wd * lr * p) as in the
    reference (`ranger.py:176-177`).

The learning rate is a hyperparameter field of the state (wrap with
`optax.inject_hyperparams` via `make_ranger`) so the engine can follow the
reference's one-scheduler-step-per-outer-iteration cadence while taking
N_ITER optimizer steps per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RangerState(NamedTuple):
    count: jnp.ndarray       # int32, number of updates taken
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    slow: optax.Params


def _centralize(path, g):
    """Gradient centralization for one leaf (see module docstring)."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name == "point_weight":
        return g - jnp.mean(g)
    if g.ndim > 1:
        axes = tuple(range(g.ndim - 1))
        return g - jnp.mean(g, axis=axes, keepdims=True)
    return g


def ranger(
    learning_rate: float = 1e-3,
    alpha: float = 0.5,
    k: int = 6,
    n_sma_threshold: float = 5.0,
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-5,
    weight_decay: float = 0.0,
    use_gc: bool = True,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RangerState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            # materialize a distinct copy: the slow buffer must not alias the
            # live params (donation would otherwise see the same buffer twice)
            slow=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "ranger requires params"
        lr = learning_rate
        t = state.count + 1
        tf = t.astype(jnp.float32)

        if use_gc:
            updates = jax.tree_util.tree_map_with_path(_centralize, updates)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates
        )
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, updates
        )

        # 1 - b^t via -expm1(t log b): the naive f32 subtraction can flip the
        # rectification branch vs torch's float64 near the threshold
        # (see solver/ranger_family.py::_rect_terms)
        import math

        beta2_t = jnp.exp(tf * math.log(b2))
        one_minus_beta2_t = -jnp.expm1(tf * math.log(b2))
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / one_minus_beta2_t
        rectified = n_sma > n_sma_threshold
        one_minus_beta1_t = -jnp.expm1(tf * math.log(b1))
        step_size_rect = jnp.sqrt(
            one_minus_beta2_t
            * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma
            * n_sma_max / (n_sma_max - 2.0)
        ) / one_minus_beta1_t
        step_size_plain = 1.0 / one_minus_beta1_t

        def leaf_update(p, m, v):
            upd_rect = -lr * step_size_rect * m / (jnp.sqrt(v) + eps)
            upd_plain = -lr * step_size_plain * m
            upd = jnp.where(rectified, upd_rect, upd_plain)
            if weight_decay != 0.0:
                upd = upd - weight_decay * lr * p
            return upd

        radam_updates = jax.tree_util.tree_map(leaf_update, params, exp_avg, exp_avg_sq)

        do_lookahead = (t % k) == 0

        def lookahead(p, upd, slow):
            fast = p + upd
            slow_new = jnp.where(do_lookahead, slow + alpha * (fast - slow), slow)
            final = jnp.where(do_lookahead, slow_new, fast)
            return final - p, slow_new

        pairs = jax.tree_util.tree_map(lookahead, params, radam_updates, state.slow)
        final_updates = jax.tree_util.tree_map(lambda pr: pr[0], pairs, is_leaf=lambda x: isinstance(x, tuple))
        new_slow = jax.tree_util.tree_map(lambda pr: pr[1], pairs, is_leaf=lambda x: isinstance(x, tuple))

        return final_updates, RangerState(t, exp_avg, exp_avg_sq, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def make_ranger(**kwargs) -> optax.GradientTransformation:
    """Ranger with the learning rate exposed as an injectable hyperparameter
    (state.hyperparams['learning_rate'])."""
    return optax.inject_hyperparams(ranger)(**kwargs)
