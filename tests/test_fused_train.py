"""Training with the custom-VJP fused rot head must match the unfused path:
same loss values AND same parameter trajectories (f32, interpreter kernels on
CPU)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.engine.train import InputNoiseConfig, TrainState, make_train_step
from catre_tpu.geom import axis_symmetry_rotation_bank
from catre_tpu.losses import LossConfig
from catre_tpu.models import CATREDisRShared, init_params
from catre_tpu.solver import build_optimizer

from test_engine import SMALL_CFG, _synthetic_batch


def test_fused_train_matches_unfused():
    base_cfg = SMALL_CFG
    fused_cfg = dataclasses.replace(base_cfg, fused_heads_train=True)

    batch = _synthetic_batch(seed=7)  # order-independent batch
    noise = InputNoiseConfig(bbox3d_aug_prob=0.0, rt_aug_prob=0.0)
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.1)

    results = {}
    for name, cfg in [("unfused", base_cfg), ("fused", fused_cfg)]:
        model = CATREDisRShared(cfg)
        params = init_params(model, cfg, jax.random.PRNGKey(1))
        tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-3}})
        state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
        step = make_train_step(model, cfg, LossConfig(), noise, tx, sym_bank, n_iter=2)
        losses = []
        key = jax.random.PRNGKey(2)
        for _ in range(4):
            key, sub = jax.random.split(key)
            state, metrics = step(state, dict(batch), sub, 1e-3)
            losses.append(float(jnp.mean(metrics["loss_total"])))
        results[name] = (losses, state.params)

    np.testing.assert_allclose(results["fused"][0], results["unfused"][0], rtol=2e-3)
    # parameter trajectories agree leaf-wise.  1e-3 margin: the VJP kernel's
    # GELU cdf polynomial carries ~1.6e-6 activation error that Ranger's
    # rectified steps amplify over 4x2 inner updates; implementation bugs
    # show up orders of magnitude above this.
    leaves_u = jax.tree_util.tree_leaves(results["unfused"][1])
    leaves_f = jax.tree_util.tree_leaves(results["fused"][1])
    for lu, lf in zip(leaves_u, leaves_f):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lu), atol=1e-3)


def test_fused_encoder_train_matches_unfused():
    """fused_encoder_train (custom-VJP encoder epilogues) rides the fused-
    heads training path and must reproduce the unfused trajectories."""
    base_cfg = dataclasses.replace(SMALL_CFG, fused_heads_train=True)
    enc_cfg = dataclasses.replace(base_cfg, fused_encoder_train=True)

    batch = _synthetic_batch(seed=9)
    noise = InputNoiseConfig(bbox3d_aug_prob=0.0, rt_aug_prob=0.0)
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.1)

    results = {}
    for name, cfg in [("flax_enc", base_cfg), ("fused_enc", enc_cfg)]:
        model = CATREDisRShared(cfg)
        params = init_params(model, cfg, jax.random.PRNGKey(1))
        tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-3}})
        state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
        step = make_train_step(model, cfg, LossConfig(), noise, tx, sym_bank, n_iter=2)
        losses = []
        key = jax.random.PRNGKey(2)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, dict(batch), sub, 1e-3)
            losses.append(float(jnp.mean(metrics["loss_total"])))
        results[name] = (losses, state.params)

    np.testing.assert_allclose(results["fused_enc"][0], results["flax_enc"][0],
                               rtol=2e-3)
    leaves_u = jax.tree_util.tree_leaves(results["flax_enc"][1])
    leaves_f = jax.tree_util.tree_leaves(results["fused_enc"][1])
    for lu, lf in zip(leaves_u, leaves_f):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lu), atol=1e-3)
