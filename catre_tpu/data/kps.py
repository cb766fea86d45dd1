"""Prior keypoint selection (KPS_TYPE).

Behavioral reference: `core/catre/engine/engine_utils.py:17-104`
(get_normed_kps / get_normed_bbox / get_normed_axis / norm_fps_points).
Shipped config uses KPS_TYPE="mean_shape" with 1024-point category mean
shapes (`configs/...120e.py:23`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normed_bbox_corners() -> np.ndarray:
    """Unit-cube 8 corners in the reference's order (`engine_utils.py:69-82`)."""
    return np.array(
        [
            [0.5, 0.5, 0.5],
            [-0.5, 0.5, 0.5],
            [-0.5, -0.5, 0.5],
            [0.5, -0.5, 0.5],
            [0.5, 0.5, -0.5],
            [-0.5, 0.5, -0.5],
            [-0.5, -0.5, -0.5],
            [0.5, -0.5, -0.5],
        ],
        dtype=np.float32,
    )


def normed_axis_points(num_kps: int = 4, with_neg: bool = False) -> np.ndarray:
    """Axis keypoints (`engine_utils.py:43-66`): points along each axis plus
    the origin."""
    num_per_axis = (num_kps - 1) // 3
    start, l = (-0.5, 1.0) if with_neg else (0.0, 0.5)
    pts = []
    for axis in range(3):
        for i in range(1, num_per_axis + 1):
            p = [0.0, 0.0, 0.0]
            p[axis] = start + l * i / num_per_axis
            pts.append(p)
    pts.append([0.0, 0.0, 0.0])
    return np.array(pts, dtype=np.float32)


def select_kps(kps_type: str, mean_points: jnp.ndarray | None = None,
               scale_est: jnp.ndarray | None = None,
               fps_points: jnp.ndarray | None = None,
               num_kps: int = 1024, with_neg_axis: bool = False) -> jnp.ndarray:
    """Return (B, K, 3) normalized prior keypoints per KPS_TYPE.

    Stays in the caller's array world: numpy in -> numpy out (the bbox/axis
    tables are tiny host broadcasts), jax in -> jax out. The inference path
    feeds host numpy and ships the result in its single put() transfer — a
    jnp result here would force a device->host fetch before the re-upload
    (an extra relay round trip per batch)."""
    kt = kps_type.lower()
    if kt == "mean_shape":
        assert mean_points is not None
        return mean_points
    if kt == "fps":
        assert fps_points is not None and scale_est is not None
        return fps_points / scale_est[:, None, :]
    assert scale_est is not None
    xp = np if isinstance(scale_est, np.ndarray) else jnp
    b = scale_est.shape[0]
    if kt == "bbox":
        return xp.broadcast_to(xp.asarray(normed_bbox_corners())[None], (b, 8, 3))
    if kt == "axis":
        axis = xp.asarray(normed_axis_points(num_kps, with_neg_axis))
        return xp.broadcast_to(axis[None], (b,) + axis.shape)
    raise NotImplementedError(f"Unknown keypoints type {kps_type}")
