"""Batched rigid/similarity point-cloud transforms and camera ops (pure jax).

Behavioral reference: `lib/pysixd/misc.py` (`transform_normed_pts_batch:1001`,
`transform_pts_batch:1029`, `backproject_th:360`, `project_pts:568`),
re-expressed as single einsum/matmul contractions that XLA maps onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def transform_normed_pts(pts: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray | None = None,
                         scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """`R @ (pts * scale) (+ t)` batched.

    Args:
      pts: (B, P, 3) normalized points
      R: (B, 3, 3)
      t: (B, 3) or (B, 3, 1) or None
      scale: (B, 3) or None (anisotropic per-axis scale)
    Returns:
      (B, P, 3)
    """
    if scale is not None:
        pts = pts * scale[:, None, :]
    # (B,P,3) x (B,3,3)^T contraction: out[b,p,i] = sum_j R[b,i,j] pts[b,p,j]
    out = jnp.einsum("bij,bpj->bpi", R, pts)
    if t is not None:
        out = out + t.reshape(t.shape[0], 1, 3)
    return out


def transform_pts(pts: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray | None = None) -> jnp.ndarray:
    """`R @ pts (+ t)` batched. pts: (B, P, 3), R: (B, 3, 3), t: (B, 3)."""
    out = jnp.einsum("bij,bpj->bpi", R, pts)
    if t is not None:
        out = out + t.reshape(t.shape[0], 1, 3)
    return out


def backproject(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pinhole depth map -> organized cloud map.

    Matches reference `lib/pysixd/misc.py:360-378` (backproject_th).

    Args:
      depth: (H, W) metric depth
      K: (3, 3) intrinsics
    Returns:
      (H, W, 3) organized cloud
    """
    H, W = depth.shape
    ys = jnp.arange(H, dtype=depth.dtype) - K[1, 2]
    xs = jnp.arange(W, dtype=depth.dtype) - K[0, 2]
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([X * depth / K[0, 0], Y * depth / K[1, 1], depth], axis=2)


def project_pts(pts: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Project 3D points with K[R|t]. pts: (P, 3) -> (P, 2) pixels.

    Matches reference `lib/pysixd/misc.py:568-582`.
    """
    cam = pts @ R.T + t.reshape(1, 3)
    uvw = cam @ K.T
    return uvw[:, :2] / uvw[:, 2:3]


def pose_compose_3x4(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Stack (B,3,3) + (B,3) -> (B,3,4) pose matrices."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_3x4_to_4x4_np(pose) -> "np.ndarray":
    """Host-numpy (..., 3, 4) -> (..., 4, 4) with a bit-exact [0,0,0,1]
    bottom row (the eval protocol asserts on it). Kept on host: a jnp call
    per pose costs a device dispatch on the hot evaluator paths."""
    import numpy as np

    pose = np.asarray(pose)
    bottom = np.zeros(pose.shape[:-2] + (1, 4), dtype=pose.dtype)
    bottom[..., 0, 3] = 1.0
    return np.concatenate([pose, bottom], axis=-2)


def pose_3x4_to_4x4(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) homogeneous."""
    bottom = jnp.zeros(pose.shape[:-2] + (1, 4), dtype=pose.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)
