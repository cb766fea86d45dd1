"""Jitted training step: the reference's inner refine loop — forward +
backward + optimizer step PER refine iteration with detached pose feedback
(`core/catre/engine/engine.py:293-355`) — expressed as one `jax.lax.scan`
whose carry is (params, opt_state, pose_est, scale_est).

Batch-level 3D augmentation and gt-noise init-pose sampling
(`engine/batching.py:9-146`) run on device inside the same jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.aug import aug_3d_bbox, aug_poses_normal, aug_rt, aug_scale_normal, maybe_apply
from ..geom.errors import rotation_error_deg, translation_error
from ..losses import LossConfig, catre_loss
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


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # outer iteration counter


def _set_lr(opt_state, lr):
    """Overwrite the injected learning-rate hyperparameter."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


def prepare_train_batch(key, batch: dict, noise_cfg: InputNoiseConfig) -> dict:
    """Device-side batch augmentation + initial estimate sampling.

    Mirrors `batch_data` aug (`batching.py:78-82`) and `batch_updater` iter-0
    init sampling (`engine_utils.py:187-247`, gt_noise mode).
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

    batch["obj_pose_est"] = aug_poses_normal(
        k_pose, batch["obj_pose"],
        jnp.asarray(noise_cfg.noise_rot_std), jnp.asarray(noise_cfg.noise_trans_std),
        max_rot=noise_cfg.noise_rot_max, min_z=noise_cfg.init_trans_min_z,
    )
    batch["obj_scale_est"] = aug_scale_normal(
        k_scale, batch["obj_scale"], jnp.asarray(noise_cfg.noise_scale_std),
        min_s=noise_cfg.init_scale_min, max_s=noise_cfg.init_scale_max,
    )
    return batch


def make_train_step(model: CATREDisRShared, cfg: CATREConfig, loss_cfg: LossConfig,
                    noise_cfg: InputNoiseConfig, tx: optax.GradientTransformation,
                    sym_bank, n_iter: int):
    """Build the jitted train step for a fixed number of refine iterations
    (the warmup schedule recompiles per n_iter value, at most N_ITER_TRAIN
    times)."""
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
            metrics["error_R"] = jnp.mean(
                rotation_error_deg(pose[:, :3, :3], batch["obj_pose"][:, :3, :3])
            )
            metrics["error_t"] = jnp.mean(
                translation_error(pose[:, :3, 3], batch["obj_pose"][:, :3, 3])
            )
            return (params, opt_state, pose_est, scale_est), metrics

        carry = (state.params, opt_state, batch["obj_pose_est"], batch["obj_scale_est"])
        (params, opt_state, _, _), metrics = jax.lax.scan(body, carry, None, length=n_iter)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
