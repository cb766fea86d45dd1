"""Symmetry rotation banks and vectorized closest-rotation selection.

The reference discretizes a continuous axis symmetry into
ceil(pi/max_sym_disc_step) steps (`lib/pysixd/misc.py:220-231`,
MAX_SYM_DISC_STEP=0.01 -> 315 steps -> 314 non-identity rotations) and then,
per sample, loops over all candidates on the host to pick the gt rotation
closest to the prediction (`core/utils/pose_utils.py:472-529`).

TPU-native design: one static rotation bank (K, 3, 3) shared by all samples
(all NOCS symmetries are y-axis) + a per-sample boolean `sym_flag`.  The
closest-rot search becomes a single batched [B, K] trace-argmax on device —
no host loop, no per-sample dynamic shapes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def axis_symmetry_rotation_bank(axis=(0, 1, 0), max_sym_disc_step: float = 0.01,
                                include_identity: bool = True) -> np.ndarray:
    """Discretized rotations around `axis`.

    Matches `get_axis_symmetry_transformations` (`lib/pysixd/misc.py:220-231`):
    discrete_steps_count = ceil(pi / step); angles i*2pi/count for i in
    1..count-1.  With include_identity, the identity is prepended (the
    reference's closest-rot search starts from rot_gt itself, i.e. identity).

    Returns:
      (K, 3, 3) float32; K = count (with identity) or count-1.
    """
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    count = int(np.ceil(np.pi / max_sym_disc_step))
    step = 2.0 * np.pi / count
    angles = np.arange(1, count) * step
    x, y, z = axis
    c = np.cos(angles)
    s = np.sin(angles)
    C = 1 - c
    rots = np.stack(
        [
            x * x * C + c, x * y * C - z * s, x * z * C + y * s,
            x * y * C + z * s, y * y * C + c, y * z * C - x * s,
            x * z * C - y * s, y * z * C + x * s, z * z * C + c,
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    if include_identity:
        rots = np.concatenate([np.eye(3)[None], rots], axis=0)
    return rots.astype(np.float32)


def closest_rot_batch(pred_rots: jnp.ndarray, gt_rots: jnp.ndarray,
                      sym_flags: jnp.ndarray, sym_bank: jnp.ndarray) -> jnp.ndarray:
    """Per-sample closest gt rotation under the symmetry bank.

    For symmetric samples the candidates are gt_rot @ S_k (model-to-model
    post-rotation, matching `get_closest_rot`, `pose_utils.py:472-497`); the
    geodesic distance argmin equals the trace argmax of pred^T candidate.
    Non-symmetric samples keep gt_rot unchanged.

    Args:
      pred_rots: (B, 3, 3)
      gt_rots: (B, 3, 3)
      sym_flags: (B,) bool — True for axis-symmetric samples
      sym_bank: (K, 3, 3) with identity at index 0
    Returns:
      (B, 3, 3) closest gt rotations (gradient-stopped selection indices).
    """
    # candidates[b,k] = gt[b] @ bank[k]
    cand = jnp.einsum("bij,kjl->bkil", gt_rots, sym_bank)  # (B, K, 3, 3)
    # trace(pred^T cand) = sum_ij pred[b,i,j] * cand[b,k,i,j]
    tr = jnp.einsum("bij,bkij->bk", pred_rots, cand)
    k_best = jnp.argmax(tr, axis=1)  # (B,)
    k_best = jnp.where(sym_flags, k_best, 0)  # identity for non-sym
    return jnp.take_along_axis(cand, k_best[:, None, None, None], axis=1)[:, 0]


def y_rotation_bank_20() -> np.ndarray:
    """The 20 y-axis rotations used by the fixed-IoU eval for symmetric
    classes (`core/catre/engine/test_utils.py:186-201`), as 4x4 matrices."""
    n = 20
    thetas = 2.0 * math.pi * np.arange(n) / n
    c, s = np.cos(thetas), np.sin(thetas)
    out = np.zeros((n, 4, 4), dtype=np.float64)
    out[:, 0, 0] = c
    out[:, 0, 2] = s
    out[:, 1, 1] = 1
    out[:, 2, 0] = -s
    out[:, 2, 2] = c
    out[:, 3, 3] = 1
    return out
