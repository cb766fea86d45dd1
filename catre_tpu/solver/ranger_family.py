"""Ranger-family optimizer tail (registry-selectable in the reference):
ranger2020, ranger_adabelief, badam, ranger21 — as optax transformations.

Behavioral references (golden-tested against the imported torch files in
tests/test_solver_family.py):
  - `lib/torch_utils/solver/ranger2020.py:60-268` — RAdam + per-param
    Lookahead + GC with `gc_loc` (centralize the raw grad vs the generalized
    gradient) and `gc_conv_only`.
  - `lib/torch_utils/solver/ranger_adabelief.py:24-265` — same skeleton with
    the AdaBelief variance ((g - m)^2) and a `weight_decouple` switch.
    Quirk reproduced faithfully: in the rectified branch the reference's
    `exp_avg_sq.add_(eps)` MUTATES the stored second moment, so eps
    accumulates into the state across steps (`ranger_adabelief.py:233`).
  - `lib/torch_utils/solver/badam.py:7-112` — AdamW-style multiplicative
    decay, eps inside the sqrt, `exp_avg_sq` initialized at `avg_sq_init`
    instead of zeros, and NO bias correction.
  - `lib/torch_utils/solver/ranger21.py:86-645` — AGC + GC + grad
    normalization + positive-negative momentum AdamW core + softplus'd
    denominator + stable weight decay + norm loss + Lookahead.
    KNOWN REFERENCE BUG, not replicated: phase 2 applies stable weight decay
    and norm loss to the leftover loop variable `p` of phase 1 — i.e. to one
    stale parameter per group instead of each parameter
    (`ranger21.py:455-476` — `p` is not rebound until the inner loop at
    `:481`). Here both are applied per-parameter as upstream Ranger21
    intends; the golden test pins the reference bitwise with
    weight_decay=0 / normloss off, where the buggy lines are no-ops.

Tensor-layout note: torch keeps the output axis FIRST (GC/unit-norm reduce
over dims 1..n-1); flax kernels keep it LAST, so every axis-wise reduction
here runs over all axes except the last (same elements, transposed layout —
see `solver/ranger.py`'s identical convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

tmap = jax.tree_util.tree_map


def _gc(g, gc_conv_only: bool = False, name: str = ""):
    """Gradient centralization (`ranger2020.py:31-57`, flax layout). The rot
    head's flat (P,) point_weight corresponds to a torch Conv1d (1, P, 1)
    weight — centralized over ALL elements, like `solver/ranger.py`."""
    if name == "point_weight" and not gc_conv_only:
        return g - jnp.mean(g)
    if gc_conv_only:
        if g.ndim > 3:
            return g - jnp.mean(g, axis=tuple(range(g.ndim - 1)), keepdims=True)
        return g
    if g.ndim > 1:
        return g - jnp.mean(g, axis=tuple(range(g.ndim - 1)), keepdims=True)
    return g


def _leaf_name(path) -> str:
    last = path[-1]
    return last.key if hasattr(last, "key") else str(last)


def _rect_terms(t, b1: float, b2: float, n_sma_threshold: float):
    """RAdam rectification shared by the family (`ranger2020.py:215-235`).

    1 - b2^t is evaluated as -expm1(t*log(b2)): the naive f32 subtraction
    loses ~5 digits and n_sma (a difference of two ~2/(1-b2) numbers) can
    land on the wrong side of the threshold vs torch's float64 — a real
    branch flip observed at step 5 with b2=0.999."""
    import math

    tf = t.astype(jnp.float32)
    log_b2 = math.log(b2)
    beta2_t = jnp.exp(tf * log_b2)
    one_minus_beta2_t = -jnp.expm1(tf * log_b2)
    n_sma_max = 2.0 / (1.0 - b2) - 1.0
    n_sma = n_sma_max - 2.0 * tf * beta2_t / one_minus_beta2_t
    rectified = n_sma > n_sma_threshold
    one_minus_beta1_t = -jnp.expm1(tf * math.log(b1))
    step_rect = jnp.sqrt(
        one_minus_beta2_t * (n_sma - 4.0) / (n_sma_max - 4.0)
        * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0)
    ) / one_minus_beta1_t
    step_plain = 1.0 / one_minus_beta1_t
    return rectified, step_rect, step_plain


class RangerFamilyState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    slow: optax.Params


def _ranger_core(learning_rate, alpha, k, n_sma_threshold, b1, b2, eps,
                 weight_decay, use_gc, gc_conv_only, gc_loc,
                 adabelief: bool, weight_decouple: bool):
    """Shared body of ranger2020 / ranger_adabelief."""

    def init_fn(params):
        return RangerFamilyState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=tmap(jnp.zeros_like, params),
            exp_avg_sq=tmap(jnp.zeros_like, params),
            slow=tmap(lambda p: jnp.array(p, copy=True), params),
        )

    def update_fn(updates, state, params):
        assert params is not None
        lr = learning_rate
        t = state.count + 1
        if not weight_decouple and weight_decay != 0.0:
            # coupled decay: grad += wd * p BEFORE gc (`ranger_adabelief.py:146`)
            updates = tmap(lambda g, p: g + weight_decay * p, updates, params)
        if use_gc and gc_loc:
            updates = jax.tree_util.tree_map_with_path(
                lambda p, g: _gc(g, gc_conv_only, _leaf_name(p)), updates)

        exp_avg = tmap(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates)
        if adabelief:
            # residual vs the UPDATED mean (`ranger_adabelief.py:195-200`)
            exp_avg_sq = tmap(
                lambda v, g, m: b2 * v + (1 - b2) * (g - m) * (g - m),
                state.exp_avg_sq, updates, exp_avg)
        else:
            exp_avg_sq = tmap(lambda v, g: b2 * v + (1 - b2) * g * g,
                              state.exp_avg_sq, updates)

        rectified, step_rect, step_plain = _rect_terms(t, b1, b2, n_sma_threshold)

        if adabelief:
            # reference quirk: eps is added INTO the stored second moment in
            # the rectified branch (`ranger_adabelief.py:233` uses add_)
            exp_avg_sq = tmap(lambda v: jnp.where(rectified, v + eps, v),
                              exp_avg_sq)

        def g_grad(path, p, m, v):
            # reference aliasing quirk: in the NON-rectified branch
            # `G_grad = exp_avg` is the state tensor itself, so the decoupled
            # weight-decay add_ and the gc_loc=False centralization MUTATE
            # the stored first moment (`ranger2020.py:238-250` — only the
            # rectified branch's `exp_avg / denom` makes a copy)
            denom = jnp.sqrt(v) + eps

            def tail(G):
                if weight_decouple and weight_decay != 0.0:
                    G = G + weight_decay * p
                if use_gc and not gc_loc:
                    G = _gc(G, gc_conv_only, _leaf_name(path))
                return G

            G_rect = tail(m / denom)
            G_plain = tail(m)
            upd = jnp.where(rectified, -lr * step_rect * G_rect,
                            -lr * step_plain * G_plain)
            m_store = jnp.where(rectified, m, G_plain)
            return upd, m_store

        pairs_g = jax.tree_util.tree_map_with_path(g_grad, params, exp_avg,
                                                   exp_avg_sq)
        is_pair = lambda x: isinstance(x, tuple)
        upd = tmap(lambda pr: pr[0], pairs_g, is_leaf=is_pair)
        exp_avg = tmap(lambda pr: pr[1], pairs_g, is_leaf=is_pair)

        do_la = (t % k) == 0

        def lookahead(p, u, slow):
            fast = p + u
            slow_new = jnp.where(do_la, slow + alpha * (fast - slow), slow)
            final = jnp.where(do_la, slow_new, fast)
            return final - p, slow_new

        pairs = tmap(lookahead, params, upd, state.slow)
        final_upd = tmap(lambda pr: pr[0], pairs, is_leaf=is_pair)
        new_slow = tmap(lambda pr: pr[1], pairs, is_leaf=is_pair)
        return final_upd, RangerFamilyState(t, exp_avg, exp_avg_sq, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger2020(learning_rate: float = 1e-3, alpha: float = 0.5, k: int = 6,
               n_sma_threshold: float = 5.0, b1: float = 0.95, b2: float = 0.999,
               eps: float = 1e-5, weight_decay: float = 0.0, use_gc: bool = True,
               gc_conv_only: bool = False, gc_loc: bool = True):
    return _ranger_core(learning_rate, alpha, k, n_sma_threshold, b1, b2, eps,
                        weight_decay, use_gc, gc_conv_only, gc_loc,
                        adabelief=False, weight_decouple=True)


def ranger_adabelief(learning_rate: float = 1e-3, alpha: float = 0.5, k: int = 6,
                     n_sma_threshold: float = 5.0, b1: float = 0.95,
                     b2: float = 0.999, eps: float = 1e-5,
                     weight_decay: float = 0.0, use_gc: bool = True,
                     gc_conv_only: bool = False, gc_loc: bool = True,
                     adabelief: bool = True, weight_decouple: bool = True):
    return _ranger_core(learning_rate, alpha, k, n_sma_threshold, b1, b2, eps,
                        weight_decay, use_gc, gc_conv_only, gc_loc,
                        adabelief=adabelief, weight_decouple=weight_decouple)


class BAdamState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def badam(learning_rate: float = 1e-2, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-6, weight_decay: float = 1e-2,
          avg_sq_init: float = 1e-3):
    def init_fn(params):
        return BAdamState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=tmap(jnp.zeros_like, params),
            # large second-moment init replaces warmup/bias correction
            # (`badam.py:13-14,91`)
            exp_avg_sq=tmap(lambda p: jnp.full_like(p, avg_sq_init), params),
        )

    def update_fn(updates, state, params):
        assert params is not None
        lr = learning_rate
        exp_avg = tmap(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates)
        exp_avg_sq = tmap(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.exp_avg_sq, updates)
        # p_new = p*(1 - lr*wd) - lr * m / sqrt(v + eps)   (`badam.py:76,112`)
        upd = tmap(
            lambda p, m, v: -lr * weight_decay * p - lr * m / jnp.sqrt(v + eps),
            params, exp_avg, exp_avg_sq)
        return upd, BAdamState(state.count + 1, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------- ranger21
class Ranger21State(NamedTuple):
    count: jnp.ndarray
    grad_ma: optax.Updates      # positive-step momentum buffer
    neg_grad_ma: optax.Updates  # negative-step momentum buffer
    variance_ma: optax.Updates
    slow: optax.Params


def _unit_norm(x):
    """Axis-wise euclidean norm (`ranger21.py:251-269`, flax layout: reduce
    over all axes except the last; whole tensor for ndim <= 1)."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


def _agc(p, g, clip_val: float, agc_eps: float):
    """Adaptive gradient clipping (`ranger21.py:271-291`)."""
    p_norm = jnp.maximum(_unit_norm(p), agc_eps)
    g_norm = _unit_norm(g)
    max_norm = p_norm * clip_val
    clipped = g * (max_norm / jnp.maximum(g_norm, 1e-6))
    return jnp.where(g_norm > max_norm, clipped, g)


def _grad_normalize(g, epsilon: float = 1e-8):
    """Whole-tensor stdev normalization (`ranger21.py:54-67`; torch's
    unbiased std). No-op for tensors with <= 2 elements."""
    if g.size <= 2:
        return g
    return g / (jnp.std(g, ddof=1) + epsilon)


def ranger21(learning_rate: float, weight_decay: float = 1e-4,
             b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
             lookahead_active: bool = True, lookahead_mergetime: int = 5,
             lookahead_alpha: float = 0.5,
             use_adaptive_gradient_clipping: bool = True,
             agc_clipping_value: float = 1e-2, agc_eps: float = 1e-3,
             using_gc: bool = True, using_normgc: bool = True,
             gc_conv_only: bool = False,
             normloss_active: bool = True, normloss_factor: float = 1e-4,
             pnm_momentum_factor: float = 1.0,
             softplus: bool = True, beta_softplus: float = 50.0):
    """Ranger21 AdamW + positive-negative-momentum core (the reference's
    default engine; the madgrad core is config-dead there). Stable weight
    decay and norm loss are per-parameter (see module docstring re the
    reference's phase-2 leftover-`p` bug)."""

    def prep_grad(p, g, second_pass: bool, name: str = ""):
        # phase-1 in-place mutation semantics: AGC + GC land in p.grad, and
        # phase 2 re-applies GC (idempotent) and std-normalization (NOT
        # idempotent) to the already-normalized grad (`ranger21.py:383-400`
        # mutate p.grad via add_/div_; `:577-583` re-apply)
        if use_adaptive_gradient_clipping and not second_pass:
            g = _agc(p, g, agc_clipping_value, agc_eps)
        if using_gc:
            g = _gc(g, gc_conv_only, name)
        if using_normgc:
            g = _grad_normalize(g)
        return g

    def init_fn(params):
        return Ranger21State(
            count=jnp.zeros([], jnp.int32),
            grad_ma=tmap(jnp.zeros_like, params),
            neg_grad_ma=tmap(jnp.zeros_like, params),
            variance_ma=tmap(jnp.zeros_like, params),
            slow=tmap(lambda p: jnp.array(p, copy=True), params),
        )

    def update_fn(updates, state, params):
        assert params is not None
        lr = learning_rate
        t = state.count + 1
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(b1, tf)
        bc2 = 1.0 - jnp.power(b2, tf)

        grad1 = jax.tree_util.tree_map_with_path(
            lambda pa, p, g: prep_grad(p, g, False, _leaf_name(pa)),
            params, updates)
        variance_ma = tmap(lambda v, g: b2 * v + (1 - b2) * g * g,
                           state.variance_ma, grad1)

        # stable weight decay scale: global debiased-variance RMS
        # (`ranger21.py:427-447`)
        var_sum = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(variance_ma))
        n_params = sum(v.size for v in jax.tree_util.tree_leaves(variance_ma))
        variance_normalized = jnp.sqrt(var_sum / bc2 / n_params)

        grad2 = jax.tree_util.tree_map_with_path(
            lambda pa, p, g: prep_grad(p, g, True, _leaf_name(pa)),
            params, grad1)

        # positive-negative momentum: buffers alternate by step parity
        # (`ranger21.py:556-566,587-600`)
        odd = (t % 2) == 1

        def ma_update(cur_a, cur_b, g):
            ma = jnp.where(odd, cur_a, cur_b)       # buffer updated this step
            ma_new = (b1 ** 2) * ma + (1 - b1 ** 2) * g
            new_a = jnp.where(odd, ma_new, cur_a)
            new_b = jnp.where(odd, cur_b, ma_new)
            neg = jnp.where(odd, cur_b, cur_a)      # the other buffer
            return ma_new, neg, new_a, new_b

        import math

        quads = tmap(ma_update, state.grad_ma, state.neg_grad_ma, grad2)
        is_q = lambda x: isinstance(x, tuple)
        # the reference computes the pnm noise norm from BETA2 (upstream
        # Ranger21 uses beta1 here) — matched to the reference
        # (`ranger21.py:591`)
        noise_norm = math.sqrt((1.0 + b2) ** 2 + b2 ** 2)

        def step_leaf(p, quad, v):
            ma_new, neg, _, _ = quad
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            if softplus:
                denom = jax.nn.softplus(beta_softplus * denom) / beta_softplus
            pnm = (ma_new * (1 + pnm_momentum_factor)
                   - pnm_momentum_factor * neg) / noise_norm
            p_new = p
            if weight_decay:
                p_new = p_new * (1 - weight_decay * lr / variance_normalized)
            if normloss_active:
                correction = 2 * normloss_factor * (1 - 1.0 / (_unit_norm(p_new) + eps))
                p_new = p_new * (1 - lr * correction)
            p_new = p_new - (lr / bc1) * pnm / denom
            return p_new - p

        upd = tmap(step_leaf, params, quads, variance_ma, is_leaf=is_q)
        new_a = tmap(lambda q: q[2], quads, is_leaf=is_q)
        new_b = tmap(lambda q: q[3], quads, is_leaf=is_q)

        if lookahead_active:
            do_la = (t % lookahead_mergetime) == 0

            def lookahead(p, u, slow):
                fast = p + u
                merged = lookahead_alpha * fast + (1 - lookahead_alpha) * slow
                final = jnp.where(do_la, merged, fast)
                slow_new = jnp.where(do_la, merged, slow)
                return final - p, slow_new

            pairs = tmap(lookahead, params, upd, state.slow)
            upd = tmap(lambda pr: pr[0], pairs, is_leaf=is_q)
            new_slow = tmap(lambda pr: pr[1], pairs, is_leaf=is_q)
        else:
            new_slow = state.slow

        return upd, Ranger21State(t, new_a, new_b, variance_ma, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)
