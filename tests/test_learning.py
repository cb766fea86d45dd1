"""Behavioral test: after a short training run on a synthetic category, the
refiner must IMPROVE pose accuracy over the noisy initialization (the core
claim of the method). Uses a fixed canonical shape so the task is learnable
quickly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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

RNG = np.random.default_rng(17)

P = 64
CFG = CATREConfig(num_pcl=P, num_kps=P)

# one fixed canonical shape (the "category mean shape")
CANONICAL = (RNG.normal(size=(P, 3)) * 0.25).clip(-0.5, 0.5).astype(np.float32)


def _make_batch(b, key):
    ks = np.asarray(jax.random.split(key, 4))
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
                         dtype=np.float32), (b, 1, 1))
    return {
        "pcl": jnp.asarray(pcl),
        "obj_kps": jnp.asarray(kps),
        "obj_pose": jnp.asarray(pose),
        "obj_scale": jnp.asarray(scale),
        "obj_mean_scales": jnp.asarray(scale),
        "K": jnp.asarray(K),
        "sym_flag": jnp.zeros(b, dtype=bool),
        "valid": jnp.ones(b, dtype=bool),
    }


@pytest.mark.slow
def test_refiner_learns_to_improve_pose():
    model = CATREDisRShared(CFG)
    params = init_params(model, CFG, jax.random.PRNGKey(0))
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 2e-3}})
    state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))

    noise = InputNoiseConfig(
        bbox3d_aug_prob=0.0, rt_aug_prob=0.0,
        noise_rot_std=(10.0,), noise_trans_std=((0.02, 0.02, 0.02),),
        noise_scale_std=((0.01, 0.01, 0.01),),
    )
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.2)
    step = make_train_step(model, CFG, LossConfig(), noise, tx, sym_bank, n_iter=1)

    key = jax.random.PRNGKey(1)
    for i in range(1500):
        key, k1, k2 = jax.random.split(key, 3)
        batch = _make_batch(16, k1)
        state, metrics = step(state, batch, k2, 2e-3)

    # evaluation: refine noisy inits with the trained model (64 samples to
    # keep the single-draw eval noise well inside the assertion margins)
    key, k1, k2, k3 = jax.random.split(key, 4)
    batch = _make_batch(64, k1)
    from catre_tpu.data.aug import aug_poses_normal

    init_pose = aug_poses_normal(
        k2, batch["obj_pose"], jnp.asarray([10.0]), jnp.asarray([[0.02, 0.02, 0.02]]))
    refine = make_refine_fn(model, CFG, n_iter=4)
    poses, scales = refine(state.params, batch["pcl"], batch["obj_kps"], init_pose,
                           batch["obj_scale"], batch["K"], batch["obj_mean_scales"])

    gt_R = batch["obj_pose"][:, :3, :3]
    gt_t = batch["obj_pose"][:, :3, 3]
    re0 = float(jnp.mean(rotation_error_deg(poses[0, :, :3, :3], gt_R)))
    te0 = float(jnp.mean(translation_error(poses[0, :, :3, 3], gt_t)))
    re4 = float(jnp.mean(rotation_error_deg(poses[4, :, :3, :3], gt_R)))
    te4 = float(jnp.mean(translation_error(poses[4, :, :3, 3], gt_t)))

    # BOTH errors must genuinely improve over the init. Measured on the
    # exact fresh-batch stream (lr 2e-3, n_iter 1): re ratio 0.83 @ 900,
    # 0.56 @ 1200, 0.45 @ 1500 steps; te ratio plateaus ~0.83 from step 900
    # — bounds leave ~25% margin for the end-eval draw. Deterministic under
    # the fixed seeds. The fast default-suite gate is
    # tests/test_fast_learning.py; the full-regime proof is docs/TRAINRUN.md.
    assert te4 < te0 * 0.92, (te0, te4)
    assert re4 < re0 * 0.6, (re0, re4)
