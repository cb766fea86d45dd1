"""Extended optimizer registry beyond Ranger.

The reference exposes ~16 registry-selectable optimizers
(`lib/torch_utils/solver/*`: AdaBelief, AdamP, SGDP, MADGRAD, NAdamW,
RAdam, Ralamb, rmsprop_tf, SGD_GC(C), lookahead, over9000/RangerLars, ...)
of which only Ranger is exercised by any shipped config
(`core/utils/solver_utils.py:28-99` lazily registers them).  This module
provides the same selectable surface on optax primitives:

  - optax-native: adabelief, nadam, nadamw, radam, lamb, lars, rmsprop
    (optax's default `eps_in_sqrt=True` is the tf/caffe2 variant, i.e.
    the reference's `rmsprop_tf`).
  - composed here: ralamb (= RAdam + layerwise trust ratio,
    `lib/torch_utils/solver/ralamb.py`), over9000 / rangerlars
    (= Ralamb + Lookahead + GC, `lib/torch_utils/solver/over9000.py`),
    sgd_gc / sgd_gcc (SGD with gradient centralization,
    `lib/torch_utils/solver/sgd_gc.py`), lookahead(inner).
  - implemented here: madgrad (`lib/torch_utils/solver/madgrad.py`),
    adamp / sgdp (`lib/torch_utils/solver/adamp.py`, scale-invariance
    projection).

All are flax-layout aware: torch's output-channel-first kernels are
(in..., out) here, so "mean over all but dim 0" becomes "mean over all
but the last axis" (see `ranger._centralize`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .ranger import _centralize


def gradient_centralization() -> optax.GradientTransformation:
    """GC as a standalone gradient transformation (GC paper; reference
    applies it inside Ranger/SGD_GC).  Centralizes every gradient whose
    parameter has >1 axis over the non-output axes."""

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map_with_path(_centralize, updates), state

    return optax.GradientTransformation(lambda p: optax.EmptyState(), update_fn)


class LookaheadState(NamedTuple):
    count: jnp.ndarray
    slow: optax.Params
    inner: optax.OptState


def lookahead_wrap(inner: optax.GradientTransformation, k: int = 6,
                   alpha: float = 0.5) -> optax.GradientTransformation:
    """Parameter-level Lookahead around any inner optimizer
    (`lib/torch_utils/solver/lookahead.py`).  Every k inner steps the slow
    buffer moves alpha toward the fast weights and the fast weights snap to
    it — identical mechanics to the Ranger-internal one."""

    def init_fn(params):
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params),
            inner=inner.init(params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        t = state.count + 1
        sync = (t % k) == 0

        def leaf(p, upd, slow):
            fast = p + upd
            slow_new = jnp.where(sync, slow + alpha * (fast - slow), slow)
            final = jnp.where(sync, slow_new, fast)
            return final - p, slow_new

        pairs = jax.tree_util.tree_map(leaf, params, inner_updates, state.slow)
        is_pair = lambda x: isinstance(x, tuple)  # noqa: E731
        final_updates = jax.tree_util.tree_map(lambda pr: pr[0], pairs, is_leaf=is_pair)
        new_slow = jax.tree_util.tree_map(lambda pr: pr[1], pairs, is_leaf=is_pair)
        return final_updates, LookaheadState(t, new_slow, inner_state)

    return optax.GradientTransformation(init_fn, update_fn)


def ralamb(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-8, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam step direction scaled by the LARS layerwise trust ratio
    (`lib/torch_utils/solver/ralamb.py`)."""
    chain = [optax.scale_by_radam(b1=b1, b2=b2, eps=eps)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [optax.scale_by_trust_ratio(), optax.scale(-learning_rate)]
    return optax.chain(*chain)


def over9000(learning_rate: float, k: int = 6, alpha: float = 0.5,
             weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RangerLars: GC + Ralamb + Lookahead (`lib/torch_utils/solver/over9000.py`)."""
    inner = optax.chain(gradient_centralization(),
                        ralamb(learning_rate, weight_decay=weight_decay))
    return lookahead_wrap(inner, k=k, alpha=alpha)


class MadgradState(NamedTuple):
    count: jnp.ndarray
    grad_sum: optax.Updates      # s_k = sum lambda_k g
    grad_sum_sq: optax.Updates   # v_k = sum lambda_k g*g
    x0: optax.Params


def madgrad(learning_rate: float, momentum: float = 0.9, eps: float = 1e-6,
            weight_decay: float = 0.0) -> optax.GradientTransformation:
    """MADGRAD (Defazio & Jelassi 2021; `lib/torch_utils/solver/madgrad.py`):
    dual averaging with cube-root denominators and iterate averaging."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return MadgradState(
            count=jnp.zeros([], jnp.int32),
            grad_sum=zeros,
            grad_sum_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            x0=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "madgrad requires params"
        t = state.count
        lamb = learning_rate * jnp.sqrt(t.astype(jnp.float32) + 1.0)

        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)

        s = jax.tree_util.tree_map(lambda a, g: a + lamb * g,
                                   state.grad_sum, updates)
        v = jax.tree_util.tree_map(lambda a, g: a + lamb * g * g,
                                   state.grad_sum_sq, updates)

        def leaf(p, x0, s_, v_):
            z = x0 - s_ / (jnp.cbrt(v_) + eps)
            new_p = (1.0 - momentum) * p + momentum * z
            return new_p - p

        new_updates = jax.tree_util.tree_map(leaf, params, state.x0, s, v)
        return new_updates, MadgradState(t + 1, s, v, state.x0)

    return optax.GradientTransformation(init_fn, update_fn)


def _projection(delta: float = 0.1, wd_ratio: float = 0.1):
    """AdamP/SGDP scale-invariance projection: when a parameter and its
    update are nearly collinear in cosine similarity (scale direction),
    remove the radial component of the update and damp weight decay
    (`lib/torch_utils/solver/adamp.py:14-43`)."""

    def project(p, u):
        if p.ndim < 2:
            return u, jnp.float32(1.0)
        pf = p.reshape(-1)
        uf = u.reshape(-1)
        pn = pf / (jnp.linalg.norm(pf) + 1e-12)
        cos = jnp.abs(jnp.dot(pn, uf)) / (jnp.linalg.norm(uf) + 1e-12)
        on_scale = cos < delta / jnp.sqrt(jnp.float32(pf.shape[0]))
        perp = uf - jnp.dot(pn, uf) * pn
        out = jnp.where(on_scale, perp, uf).reshape(u.shape)
        ratio = jnp.where(on_scale, jnp.float32(wd_ratio), jnp.float32(1.0))
        return out, ratio

    return project


def _projected(base_scale: optax.GradientTransformation, learning_rate: float,
               weight_decay: float, delta: float, wd_ratio: float,
               nesterov_name: str) -> optax.GradientTransformation:
    project = _projection(delta, wd_ratio)

    def init_fn(params):
        return base_scale.init(params)

    def update_fn(updates, state, params):
        assert params is not None, f"{nesterov_name} requires params"
        direction, state = base_scale.update(updates, state, params)

        def leaf(p, d):
            d2, ratio = project(p, d)
            upd = -learning_rate * d2
            if weight_decay:
                upd = upd - learning_rate * weight_decay * ratio * p
            return upd

        return jax.tree_util.tree_map(leaf, params, direction), state

    return optax.GradientTransformation(init_fn, update_fn)


def adamp(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1) -> optax.GradientTransformation:
    return _projected(optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                      learning_rate, weight_decay, delta, wd_ratio, "adamp")


def sgdp(learning_rate: float, momentum: float = 0.9,
         weight_decay: float = 0.0, delta: float = 0.1,
         wd_ratio: float = 0.1) -> optax.GradientTransformation:
    return _projected(optax.trace(decay=momentum),
                      learning_rate, weight_decay, delta, wd_ratio, "sgdp")


def sgd_gc(learning_rate: float, momentum: float = 0.9,
           weight_decay: float = 0.0) -> optax.GradientTransformation:
    """SGD with gradient centralization (`lib/torch_utils/solver/sgd_gc.py`).
    GCC (conv-only) coincides with GC here: every >1-axis parameter in this
    model is a kernel."""
    chain = [gradient_centralization()]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.sgd(learning_rate, momentum=momentum))
    return optax.chain(*chain)
