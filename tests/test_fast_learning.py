"""Fast learning gate (default suite, ~50 s CPU): a short training run must
move the refiner from its untrained behavior toward the init-preserving,
error-shrinking regime. Strict and deterministic.

Why the baseline is the UNTRAINED model, not the init: at initialization the
heads output near-zero values, which are NOT a no-op — rot6d of ~0 vectors
Gram-Schmidts to an arbitrary rotation and the cosypose z-update scales z by
~0 (`pose_scale_from_delta_init.py:50-72`) — so the untrained refiner maps a
14 deg / 3 cm init to ~130 deg / ~90 cm. Training must (a) collapse that
translation failure back to init level and (b) at least halve the untrained
rotation error at the same refine iteration. The multi-hour recipe then
drives errors below the init (the slow test + docs/TRAINRUN.md cover that
regime; PERF.md "Training-system validation" documents 0.3 deg at 3000
steps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from catre_tpu.data.aug import aug_poses_normal
from catre_tpu.engine.refiner import make_refine_fn
from catre_tpu.engine.train import InputNoiseConfig, TrainState, make_train_step
from catre_tpu.geom import (
    axis_symmetry_rotation_bank,
    euler_to_mat,
    rotation_error_deg,
    transform_normed_pts,
    translation_error,
)
from catre_tpu.losses import LossConfig
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
from catre_tpu.solver import build_optimizer

P = 32
CFG = CATREConfig(num_pcl=P, num_kps=P, pclnet_out_dim=128,
                  feature_transform=False, rot_feat_dim=64, ts_feat_dim=64)
CANONICAL = (np.random.default_rng(17).normal(size=(P, 3)) * 0.25
             ).clip(-0.5, 0.5).astype(np.float32)


def _make_batch(b, key):
    ks = np.asarray(jax.random.split(key, 2))
    rng = np.random.default_rng(int(ks[0][1]))
    scale = rng.uniform(0.15, 0.25, size=(b, 3)).astype(np.float32)
    euler = rng.uniform(-0.8, 0.8, size=(b, 3)).astype(np.float32)
    R = np.asarray(euler_to_mat(jnp.asarray(euler)))
    t = np.stack([rng.uniform(-0.1, 0.1, b), rng.uniform(-0.1, 0.1, b),
                  rng.uniform(0.8, 1.0, b)], axis=1).astype(np.float32)
    pose = np.concatenate([R, t[:, :, None]], axis=2).astype(np.float32)
    kps = np.tile(CANONICAL[None], (b, 1, 1))
    pcl = np.asarray(transform_normed_pts(
        jnp.asarray(kps), jnp.asarray(R), jnp.asarray(t), jnp.asarray(scale)))
    K = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]],
                         np.float32), (b, 1, 1))
    return {"pcl": jnp.asarray(pcl), "obj_kps": jnp.asarray(kps),
            "obj_pose": jnp.asarray(pose), "obj_scale": jnp.asarray(scale),
            "obj_mean_scales": jnp.asarray(scale), "K": jnp.asarray(K),
            "sym_flag": jnp.zeros(b, bool), "valid": jnp.ones(b, bool)}


def _iter1_errors(params, model, batch, init_pose):
    refine = make_refine_fn(model, CFG, n_iter=1)
    poses, _ = refine(params, batch["pcl"], batch["obj_kps"], init_pose,
                      batch["obj_scale"], batch["K"], batch["obj_mean_scales"])
    gt_R = batch["obj_pose"][:, :3, :3]
    gt_t = batch["obj_pose"][:, :3, 3]
    re = float(jnp.mean(rotation_error_deg(poses[1, :, :3, :3], gt_R)))
    te = float(jnp.mean(translation_error(poses[1, :, :3, 3], gt_t)))
    re0 = float(jnp.mean(rotation_error_deg(poses[0, :, :3, :3], gt_R)))
    te0 = float(jnp.mean(translation_error(poses[0, :, :3, 3], gt_t)))
    return re, te, re0, te0


def test_fast_learning_smoke():
    model = CATREDisRShared(CFG)
    params0 = init_params(model, CFG, jax.random.PRNGKey(0))
    lr = 1e-3
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": lr}})
    state = TrainState(params0, tx.init(params0), jnp.zeros([], jnp.int32))
    noise = InputNoiseConfig(
        bbox3d_aug_prob=0.0, rt_aug_prob=0.0, noise_rot_std=(10.0,),
        noise_trans_std=((0.02, 0.02, 0.02),),
        noise_scale_std=((0.01, 0.01, 0.01),))
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.2)
    step = make_train_step(model, CFG, LossConfig(), noise, tx, sym_bank, n_iter=1)

    ek, e1, e2 = jax.random.split(jax.random.PRNGKey(99), 3)
    ebatch = _make_batch(64, e1)
    init_pose = aug_poses_normal(e2, ebatch["obj_pose"], jnp.asarray([10.0]),
                                 jnp.asarray([[0.02, 0.02, 0.02]]))
    # untrained baseline FIRST: train_step donates its state, so params0's
    # buffers are gone after step 1 (CLAUDE.md: train_step donates)
    re_u, te_u, re0, te0 = _iter1_errors(params0, model, ebatch, init_pose)

    key = jax.random.PRNGKey(1)
    batches = []
    for _ in range(8):
        key, k1 = jax.random.split(key)
        batches.append(_make_batch(16, k1))
    for i in range(300):
        key, k2 = jax.random.split(key)
        state, _ = step(state, batches[i % 8], k2, lr)

    re_t, te_t, _, _ = _iter1_errors(state.params, model, ebatch, init_pose)

    # untrained refiner destroys the init (see module docstring)
    assert re_u > 3 * re0 and te_u > 5 * te0, (re_u, te_u, re0, te0)
    # trained: translation failure fully recovered to init level...
    assert te_t < 1.15 * te0, (te_t, te0)
    assert te_t < te_u / 5, (te_t, te_u)
    # ...and rotation at least halved vs the untrained model
    assert re_t < re_u / 2, (re_t, re_u)
    assert np.isfinite([re_t, te_t]).all()
