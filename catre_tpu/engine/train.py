"""Jitted training step: the reference's inner refine loop — forward +
backward + optimizer step PER refine iteration with detached pose feedback
(`core/catre/engine/engine.py:293-355`) — expressed as one `jax.lax.scan`
whose carry is (params, opt_state, pose_est, scale_est).

Batch-level 3D augmentation and gt-noise init-pose sampling
(`engine/batching.py:9-146`) run on device inside the same jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.aug import aug_3d_bbox, aug_poses_normal, aug_rt, aug_scale_normal, maybe_apply
from ..geom.errors import rotation_error_deg, translation_error
from ..losses import LossConfig, catre_loss
from ..losses.common import masked_mean
from ..models.catre import CATREConfig, CATREDisRShared, refine_forward


@dataclass(frozen=True)
class InputNoiseConfig:
    """Train-time init-pose/scale noise + batch aug (INPUT.* of the shipped
    config, `configs/...120e.py:5-36`)."""

    noise_rot_std: tuple = (10.0, 5.0, 2.5, 1.25)
    noise_trans_std: tuple = ((0.02, 0.02, 0.02), (0.01, 0.01, 0.01), (0.005, 0.005, 0.005))
    noise_scale_std: tuple = ((0.01, 0.01, 0.01), (0.005, 0.005, 0.005), (0.002, 0.002, 0.002))
    noise_rot_max: float = 45.0
    init_trans_min_z: float = 0.1
    init_scale_min: float = 0.04
    init_scale_max: float = 0.45
    bbox3d_aug_prob: float = 0.5
    rt_aug_prob: float = 0.5
    # init estimate source per iteration 0 (`engine_utils.py:187-247`):
    # gt_noise | random | canonical | last_frame; one choice drawn per step
    init_pose_types: tuple = ("gt_noise",)
    init_scale_types: tuple = ("gt_noise",)
    random_trans_min: tuple = (-0.35, -0.35, 0.5)
    random_trans_max: tuple = (0.35, 0.35, 1.3)
    random_scale_min: tuple = (0.04, 0.04, 0.04)
    random_scale_max: tuple = (0.5, 0.3, 0.4)
    canonical_rot: tuple = ((1, 0, 0, 0.5), (0, 0, 1, -0.7))
    canonical_trans: tuple = (0.0, 0.0, 1.0)
    canonical_size: tuple = (0.2, 0.2, 0.2)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # outer iteration counter


def _set_lr(opt_state, lr):
    """Overwrite the injected learning-rate hyperparameter."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


def _random_rotation(key, n):
    """Uniform SO(3) rotations via normalized gaussian quaternions (matches
    the distribution of `transform.random_rotation_matrix`)."""
    from ..geom.rotations import quat_to_mat

    q = jax.random.normal(key, (n, 4))
    return quat_to_mat(q)


def _sample_init_pose(key, batch, noise_cfg: InputNoiseConfig):
    """One init-pose mode drawn per step from init_pose_types
    (`get_init_pose_train`, `engine_utils.py:216-247`)."""
    n = batch["obj_pose"].shape[0]
    k_sel, k_a, k_b = jax.random.split(key, 3)

    def gt_noise(_):
        return aug_poses_normal(
            k_a, batch["obj_pose"],
            jnp.asarray(noise_cfg.noise_rot_std), jnp.asarray(noise_cfg.noise_trans_std),
            max_rot=noise_cfg.noise_rot_max, min_z=noise_cfg.init_trans_min_z,
        )

    def random_pose(_):
        R = _random_rotation(k_a, n)
        tmin = jnp.asarray(noise_cfg.random_trans_min)
        tmax = jnp.asarray(noise_cfg.random_trans_max)
        t = jax.random.uniform(k_b, (n, 3)) * (tmax - tmin) + tmin
        return jnp.concatenate([R, t[:, :, None]], axis=-1)

    def canonical(_):
        from ..geom.rotations import rot_from_axangle_chain

        R = rot_from_axangle_chain(noise_cfg.canonical_rot)
        t = jnp.asarray(noise_cfg.canonical_trans)
        pose = jnp.concatenate([R, t[:, None]], axis=-1)
        return jnp.broadcast_to(pose[None], (n, 3, 4))

    def last_frame(_):
        return batch["last_frame_poses"][:, :3, :4]

    branch_map = {"gt_noise": gt_noise, "random": random_pose,
                  "canonical": canonical, "last_frame": last_frame}
    branches = [branch_map[t] for t in noise_cfg.init_pose_types]
    if len(branches) == 1:
        return branches[0](None)
    idx = jax.random.randint(k_sel, (), 0, len(branches))
    return jax.lax.switch(idx, branches, None)


def _sample_init_scale(key, batch, noise_cfg: InputNoiseConfig):
    """`get_init_scale_train` (`engine_utils.py:187-213`)."""
    n = batch["obj_scale"].shape[0]
    k_sel, k_a = jax.random.split(key)

    def gt_noise(_):
        return aug_scale_normal(
            k_a, batch["obj_scale"], jnp.asarray(noise_cfg.noise_scale_std),
            min_s=noise_cfg.init_scale_min, max_s=noise_cfg.init_scale_max,
        )

    def random_scale(_):
        smin = jnp.asarray(noise_cfg.random_scale_min)
        smax = jnp.asarray(noise_cfg.random_scale_max)
        return jax.random.uniform(k_a, (n, 3)) * (smax - smin) + smin

    def canonical(_):
        return jnp.broadcast_to(jnp.asarray(noise_cfg.canonical_size)[None], (n, 3))

    def last_frame(_):
        return batch["last_frame_poses"][:, :3, 4]

    branch_map = {"gt_noise": gt_noise, "random": random_scale,
                  "canonical": canonical, "last_frame": last_frame}
    branches = [branch_map[t] for t in noise_cfg.init_scale_types]
    if len(branches) == 1:
        return branches[0](None)
    idx = jax.random.randint(k_sel, (), 0, len(branches))
    return jax.lax.switch(idx, branches, None)


def prepare_train_batch(key, batch: dict, noise_cfg: InputNoiseConfig) -> dict:
    """Device-side batch augmentation + initial estimate sampling.

    Mirrors `batch_data` aug (`batching.py:78-82`) and `batch_updater` iter-0
    init sampling (`engine_utils.py:187-247`).
    Returns the batch with obj_pose/obj_scale possibly augmented and
    obj_pose_est/obj_scale_est added.
    """
    k_bbox, k_rt, k_pose, k_scale = jax.random.split(key, 4)
    pcl, scale = maybe_apply(
        k_bbox, noise_cfg.bbox3d_aug_prob, aug_3d_bbox,
        (batch["pcl"], batch["obj_scale"]),
        batch["pcl"], batch["obj_pose"], batch["obj_scale"], batch["sym_flag"],
    )
    pcl, pose = maybe_apply(
        k_rt, noise_cfg.rt_aug_prob, aug_rt,
        (pcl, batch["obj_pose"]),
        pcl, batch["obj_pose"],
    )
    batch = dict(batch, pcl=pcl, obj_pose=pose, obj_scale=scale)

    batch["obj_pose_est"] = _sample_init_pose(k_pose, batch, noise_cfg)
    batch["obj_scale_est"] = _sample_init_scale(k_scale, batch, noise_cfg)
    return batch


def make_train_step(model: CATREDisRShared, cfg: CATREConfig, loss_cfg: LossConfig,
                    noise_cfg: InputNoiseConfig, tx: optax.GradientTransformation,
                    sym_bank, n_iter: int, with_vis: bool = False):
    """Build the jitted train step for a fixed number of refine iterations
    (the warmup schedule recompiles per n_iter value, at most N_ITER_TRAIN
    times). with_vis=True additionally emits the per-instance "_vis" payload
    (TRAIN.VIS_IMG); off by default so non-vis runs don't materialize the
    scan-stacked per-instance pose/scale arrays every step."""
    sym_bank = jnp.asarray(sym_bank)

    def loss_and_outputs(params, batch, pose_est, scale_est):
        pose, scale = refine_forward(
            model, params, cfg,
            batch["pcl"], batch["obj_kps"], pose_est, scale_est,
            batch["K"], batch.get("obj_mean_scales"),
        )
        loss_dict = catre_loss(
            loss_cfg,
            out_rot=pose[:, :3, :3], out_trans=pose[:, :3, 3], out_scale=scale,
            gt_rot=batch["obj_pose"][:, :3, :3], gt_trans=batch["obj_pose"][:, :3, 3],
            gt_scale=batch["obj_scale"], obj_kps=batch["obj_kps"],
            sym_flags=batch["sym_flag"], sym_bank=sym_bank,
            valid_mask=batch.get("valid"),
        )
        total = sum(loss_dict.values())
        return total, (pose, scale, loss_dict)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, key, lr):
        batch = prepare_train_batch(key, batch, noise_cfg)
        if not cfg.refine_scale:
            # REFINE_SCLAE=False: the scale estimate is the (unperturbed) gt
            # and stays fixed (`batch_updater`, batching.py:118-121)
            batch["obj_scale_est"] = batch["obj_scale"]
        if "obj_fps_points" in batch:
            # KPS_TYPE="fps": kps are the instance fps points normalized ONCE
            # per batch by the ITERATION-1 scale estimate (batch_updater
            # caches obj_kps on its first call, `batching.py:125-126`;
            # `engine_utils.norm_fps_points`) — so the normalization must
            # happen here, after the init-scale draw / REFINE_SCLAE override
            batch["obj_kps"] = (batch["obj_fps_points"]
                                / batch["obj_scale_est"][:, None, :])
        opt_state = _set_lr(state.opt_state, lr)

        def body(carry, _):
            params, opt_state, pose_est, scale_est = carry
            (total, (pose, scale, loss_dict)), grads = jax.value_and_grad(
                loss_and_outputs, has_aux=True
            )(params, batch, pose_est, scale_est)
            # nan-grad scrub (ref engine.py:349-353 / torch_utils/misc.py:14-21)
            grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # detached feedback from the PRE-update forward (ref engine.py:324)
            pose_est = jax.lax.stop_gradient(pose)
            scale_est = jax.lax.stop_gradient(scale)
            metrics = dict(loss_dict, loss_total=total)
            # error metrics masked by validity: padded rows carry dummy
            # identity poses and must not bias the logged errors
            valid = batch.get("valid")
            w = None if valid is None else valid.astype(jnp.float32)
            metrics["error_R"] = masked_mean(
                rotation_error_deg(pose[:, :3, :3], batch["obj_pose"][:, :3, :3]), w
            )
            metrics["error_t"] = masked_mean(
                translation_error(pose[:, :3, 3], batch["obj_pose"][:, :3, 3]), w
            )
            if with_vis:
                # non-scalar vis payload (TRAIN.VIS_IMG, ref engine.py:370-422):
                # per-iter predicted pose/scale + the (possibly augmented) gt
                # the loss saw — the runner strips "_vis" before scalar logging
                metrics["_vis"] = {"pose": pose, "scale": scale}
            return (params, opt_state, pose_est, scale_est), metrics

        carry = (state.params, opt_state, batch["obj_pose_est"], batch["obj_scale_est"])
        (params, opt_state, _, _), metrics = jax.lax.scan(body, carry, None, length=n_iter)
        if with_vis:
            metrics["_vis"]["gt_pose"] = batch["obj_pose"]
            metrics["_vis"]["gt_scale"] = batch["obj_scale"]
            metrics["_vis"]["init_pose"] = batch["obj_pose_est"]
            metrics["_vis"]["valid"] = batch["valid"] if "valid" in batch else jnp.ones(
                batch["pcl"].shape[0], dtype=bool)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step

