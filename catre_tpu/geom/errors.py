"""Batched pose error metrics (pure jax).

Behavioral reference: `lib/pysixd/pose_error.py` (`re:359`, `te:406`) and the
NOCS symmetric variant `compute_RT_degree_cm_symmetry`
(`core/catre/engine/test_utils.py:619-689`).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_error_deg(R_est: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees, batched.

    arccos(clip((trace(R_est R_gt^T) - 1)/2)), matching `pose_error.py:359-376`.

    Args:
      R_est, R_gt: (..., 3, 3)
    Returns:
      (...,) degrees
    """
    m = jnp.einsum("...ij,...kj->...ik", R_est, R_gt)
    tr = jnp.trace(m, axis1=-2, axis2=-1)
    cos = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos))


def translation_error(t_est: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """L2 translation error, batched. (..., 3) -> (...,). Ref `pose_error.py:406-417`."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def rotation_error_deg_sym_y(R_est: jnp.ndarray, R_gt: jnp.ndarray,
                             sym_flags: jnp.ndarray) -> jnp.ndarray:
    """NOCS-protocol rotation error: for y-axis-symmetric samples compare the
    transformed y axes; otherwise geodesic. Matches
    `compute_RT_degree_cm_symmetry` (`test_utils.py:658-682`) minus the
    det-normalization (inputs here are proper rotations).

    Args:
      R_est, R_gt: (B, 3, 3); sym_flags: (B,) bool
    """
    y_est = R_est[..., :, 1]
    y_gt = R_gt[..., :, 1]
    cos_sym = jnp.sum(y_est * y_gt, axis=-1) / (
        jnp.linalg.norm(y_est, axis=-1) * jnp.linalg.norm(y_gt, axis=-1)
    )
    err_sym = jnp.rad2deg(jnp.arccos(jnp.clip(cos_sym, -1.0, 1.0)))
    err_full = rotation_error_deg(R_est, R_gt)
    return jnp.where(sym_flags, err_sym, err_full)


def mean_re_te(pred_trans: jnp.ndarray, pred_rot: jnp.ndarray,
               gt_trans: jnp.ndarray, gt_rot: jnp.ndarray):
    """Batch-mean rotation (deg) and translation errors — the per-iteration
    scalars the reference logs (`models/model_utils.py:226-238`)."""
    return (
        jnp.mean(rotation_error_deg(pred_rot, gt_rot)),
        jnp.mean(translation_error(pred_trans, gt_trans)),
    )
