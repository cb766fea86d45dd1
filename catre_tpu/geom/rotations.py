"""Batched rotation representations (pure jax.numpy).

Semantics match the reference implementations in
`core/utils/rot_reps.py` (rot6d), `core/utils/pose_utils.py`
(quat2mat_torch:349, euler2mat_torch:266, axangle2mat_torch:299) and
`core/utils/utils.py:200` (allo_to_ego_mat_torch), re-derived for JAX.

All functions are batched over a leading axis and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (torch.nn.functional.normalize semantics:
    divide by max(norm, eps))."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def rot6d_to_mat(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (Zhou et al. CVPR'19) -> rotation matrix.

    Gram-Schmidt: x = norm(d6[:3]); z = norm(x × y_raw); y = z × x; columns
    stacked as [x|y|z].  Matches reference `rot_reps.py:34-55`.

    Args:
      d6: (..., 6)
    Returns:
      (..., 3, 3)
    """
    x_raw = d6[..., 0:3]
    y_raw = d6[..., 3:6]
    x = normalize(x_raw)
    z = normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def mat_to_rot6d(rots: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> 6D rep (first two columns). Ref `rot_reps.py:58-75`."""
    return jnp.concatenate([rots[..., :, 0], rots[..., :, 1]], axis=-1)


def quat_to_mat(quat: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit-normalized wxyz quaternion -> rotation matrix.

    Matches reference `pose_utils.py:349-416` (quat2mat_torch).

    Args:
      quat: (..., 4) in (w, x, y, z) order.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / (norm + eps)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 2.0
    X, Y, Z = qx * s, qy * s, qz * s
    wX, wY, wZ = qw * X, qw * Y, qw * Z
    xX, xY, xZ = qx * X, qx * Y, qx * Z
    yY, yZ = qy * Y, qy * Z
    zZ = qz * Z
    m = jnp.stack(
        [
            1.0 - (yY + zZ), xY - wZ, xZ + wY,
            xY + wZ, 1.0 - (xX + zZ), yZ - wX,
            xZ - wY, yZ + wX, 1.0 - (xX + yY),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def mat_to_quat(mat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> wxyz quaternion (Shepperd's branchless variant).

    Used for checkpoint conversion / tests; numerically stable for all
    rotations.
    """
    m = mat
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _case(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    q0 = _case(1.0 + t, m21 - m12, m02 - m20, m10 - m01)
    q1 = _case(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = _case(m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21)
    q3 = _case(m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22)

    cases = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    diag = jnp.stack([t, m00, m11, m22], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def euler_to_mat(angles: jnp.ndarray) -> jnp.ndarray:
    """XYZ intrinsic euler angles (radians) -> rotation matrix.

    R = Rx @ Ry @ Rz, matching reference `pose_utils.py:266-297`
    (euler2mat_torch) which is used for init-pose noise generation.

    Args:
      angles: (..., 3)
    """
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    zmat = jnp.stack([cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1).reshape(
        angles.shape[:-1] + (3, 3)
    )
    ymat = jnp.stack([cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1).reshape(
        angles.shape[:-1] + (3, 3)
    )
    xmat = jnp.stack([one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1).reshape(
        angles.shape[:-1] + (3, 3)
    )
    return xmat @ ymat @ zmat


def axangle_to_mat(axis: jnp.ndarray, angle: jnp.ndarray, is_normalized: bool = False) -> jnp.ndarray:
    """Axis-angle -> rotation matrix (Rodrigues). Ref `pose_utils.py:299-347`.

    Args:
      axis: (..., 3)
      angle: (...,) radians
    """
    if not is_normalized:
        axis = normalize(axis)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1 - c
    xs, ys, zs = x * s, y * s, z * s
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    m = jnp.stack(
        [
            x * xC + c, xyC - zs, zxC + ys,
            xyC + zs, y * yC + c, yzC - xs,
            zxC - ys, yzC + xs, z * zC + c,
        ],
        axis=-1,
    )
    return m.reshape(axis.shape[:-1] + (3, 3))


def allo_to_ego_mat(translation: jnp.ndarray, rot_allo: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Allocentric -> egocentric rotation, viewpoint-compensated by the ray to
    the object centroid. Matches reference `core/utils/utils.py:200-231`.

    Args:
      translation: (B, 3)
      rot_allo: (B, 3, 3)
    """
    cam_ray = jnp.array([0.0, 0.0, 1.0], dtype=translation.dtype)
    obj_ray = translation / (jnp.linalg.norm(translation, axis=1, keepdims=True) + eps)
    angle = jnp.arccos(obj_ray[:, 2:3])  # (B, 1); cam_ray·obj_ray
    axis = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    axis = axis / (jnp.linalg.norm(axis, axis=1, keepdims=True) + eps)
    half = angle / 2.0
    q = jnp.concatenate(
        [jnp.cos(half), axis[:, 0:1] * jnp.sin(half), axis[:, 1:2] * jnp.sin(half), axis[:, 2:3] * jnp.sin(half)],
        axis=1,
    )
    rot_allo_to_ego = quat_to_mat(q)
    return rot_allo_to_ego @ rot_allo


def qexp(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Quaternion exponential exp(q) for log-quaternion rot reps.

    Matches reference `core/utils/quaternion_lf.py:294-318` (latentfusion):
    accepts (B, 3) — pure-imaginary log quat, s=0 — or (B, 4) = (s; v).
    Returns (B, 4) wxyz, magnitude exp(s).
    """
    if q.shape[-1] == 4:
        s, v = q[..., :1], q[..., 1:]
    else:
        s = jnp.zeros_like(q[..., :1])
        v = q
    # double-where guard: norm() has an infinite derivative at 0, and a
    # branch select alone does not block the NaN cotangent of the unselected
    # branch — without this, a zero log-quat prediction (padded row, bf16
    # underflow) NaNs every parameter gradient
    theta2 = jnp.sum(jnp.square(v), axis=-1, keepdims=True)
    safe = theta2 > eps * eps
    theta = jnp.sqrt(jnp.where(safe, theta2, 1.0))
    w = jnp.where(safe, jnp.cos(theta), 1.0)
    # sinc form: sin(theta)/theta -> 1 as theta -> 0 (d xyz/dv = I at 0)
    xyz = jnp.where(safe, jnp.sin(theta) / theta, 1.0) * v
    return jnp.exp(s) * jnp.concatenate([w, xyz], axis=-1)


def lie_vec_to_mat(vec: jnp.ndarray) -> jnp.ndarray:
    """so(3) vector (axis-angle, Rodrigues) -> rotation matrix.

    Matches reference `core/utils/lie_algebra.py:7-78` (lie_vec_to_rot, a
    kornia/ceres port): exact Rodrigues for theta^2 > 1e-6, first-order
    Taylor (I + [v]_x) below. Branch-free via jnp.where so it jits and
    differentiates cleanly.

    Args:
      vec: (..., 3)
    """
    theta2 = jnp.sum(jnp.square(vec), axis=-1)
    safe = theta2 > 1e-6
    # sqrt has an infinite derivative at 0: compute it on a safe stand-in for
    # the rows the Taylor branch will take, so the unselected exact branch
    # cannot leak NaN gradients through the jnp.where (double-where guard)
    theta = jnp.sqrt(jnp.where(safe, theta2, 1.0))
    # exact branch (ref :26-47): axis = vec / (theta + 1e-6)
    R_exact = axangle_to_mat(vec / (theta[..., None] + 1e-6), theta, is_normalized=True)
    # taylor branch (ref :49-53): I + skew(vec)
    rx, ry, rz = vec[..., 0], vec[..., 1], vec[..., 2]
    one = jnp.ones_like(rx)
    R_taylor = jnp.stack(
        [one, -rz, ry, rz, one, -rx, -ry, rx, one], axis=-1
    ).reshape(vec.shape[:-1] + (3, 3))
    return jnp.where(safe[..., None, None], R_exact, R_taylor)


def mat_to_lie_vec(mat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> so(3) vector. Ref `lie_algebra.py:80-99`
    (matrix -> quaternion -> axis-angle). Used for tests/labels only."""
    q = mat_to_quat(mat)
    w, v = q[..., 0], q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1)
    half = jnp.arctan2(sin_half, w)
    k = jnp.where(sin_half > 1e-8, 2.0 * half / jnp.maximum(sin_half, 1e-12), 2.0)
    return v * k[..., None]


ROT_DIMS = {
    "allo_quat": 4, "ego_quat": 4,
    "allo_log_quat": 3, "ego_log_quat": 3,
    "allo_lie_vec": 3, "ego_lie_vec": 3,
    "allo_rot6d": 6, "ego_rot6d": 6,
}


def get_rot_dim(rot_type: str) -> int:
    """Width of the network rot output per rot_type.
    Ref `core/catre/models/model_utils.py:11-25`."""
    try:
        return ROT_DIMS[rot_type]
    except KeyError:
        raise ValueError(f"Unknown rot_type: {rot_type}") from None


def rot_rep_to_mat(rot: jnp.ndarray, rot_type: str) -> jnp.ndarray:
    """Predicted rotation rep -> rotation matrix, dispatched on ROT_TYPE.

    Ref `core/catre/models/model_utils.py:28-40` (get_rot_mat):
      {ego|allo}_quat      (B, 4) wxyz       -> quat_to_mat
      {ego|allo}_log_quat  (B, 3|4) log quat -> qexp then quat_to_mat
      {ego|allo}_lie_vec   (B, 3) so(3)      -> lie_vec_to_mat
      {ego|allo}_rot6d     (B, 6)            -> rot6d_to_mat
    """
    if rot_type in ("ego_quat", "allo_quat"):
        return quat_to_mat(rot)
    if rot_type in ("ego_log_quat", "allo_log_quat"):
        return quat_to_mat(qexp(rot))
    if rot_type in ("ego_lie_vec", "allo_lie_vec"):
        return lie_vec_to_mat(rot)
    if rot_type in ("ego_rot6d", "allo_rot6d"):
        return rot6d_to_mat(rot)
    raise ValueError(f"Wrong pred_rot type: {rot_type}")


def rot_from_axangle_chain(ax_angles) -> jnp.ndarray:
    """Compose rotations from a chain of (ax, ay, az, angle_frac_of_pi).

    Used for the `canonical` init-pose mode; matches reference
    `pose_utils.py:31-35` (np.linalg.multi_dot in list order).
    """
    R = jnp.eye(3)
    for ax_angle in ax_angles:
        axis = jnp.asarray(ax_angle[:3], dtype=jnp.float32)
        angle = jnp.asarray(ax_angle[3] * jnp.pi, dtype=jnp.float32)
        R_i = axangle_to_mat(axis[None], angle[None])[0]
        R = R @ R_i
    return R
