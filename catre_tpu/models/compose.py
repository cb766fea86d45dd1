"""Delta -> absolute pose/scale composition (pure jax function).

Behavioral reference: `core/catre/models/pose_scale_from_delta_init.py:8-95`.
Shipped config: delta_T_space="image", K_aware=True, delta_z_style="cosypose",
delta_T_weight=1.0, scale_type="iter_add", rot_type="ego_rot6d"
(`configs/_base_/catre_base.py:165-186`, `configs/...120e.py:86-101`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom.rotations import allo_to_ego_mat


def pose_scale_from_delta_init(
    rot_deltas: jnp.ndarray,      # (B, 3, 3)
    trans_deltas: jnp.ndarray,    # (B, 3) — vx, vy, vz in image space
    scale_deltas: jnp.ndarray,    # (B, 3)
    rot_inits: jnp.ndarray,       # (B, 3, 3)
    trans_inits: jnp.ndarray,     # (B, 3)
    scale_inits: jnp.ndarray,     # (B, 3) — init scale (iter_*) or mean scale (mean_*)
    Ks: jnp.ndarray | None = None,  # (B, 3, 3)
    K_aware: bool = True,
    delta_T_space: str = "image",
    delta_T_weight: float = 1.0,
    delta_z_style: str = "cosypose",
    eps: float = 1e-4,
    is_allo: bool = False,
    scale_type: str = "iter_add",
):
    """Compose predicted deltas with the initial estimate.

    Returns (rot_tgts (B,3,3), trans_tgts (B,3), scale_tgts (B,3)).
    """
    trans_deltas = trans_deltas * delta_T_weight

    if delta_T_space == "image":
        zsrc = trans_inits[:, 2:3]
        vz = trans_deltas[:, 2:3]
        if delta_z_style == "cosypose":
            ztgt = vz * zsrc  # network predicts vz = ztgt/zsrc directly
        else:  # deepim: vz = log(zsrc/ztgt)
            ztgt = zsrc / jnp.exp(vz)
        vxvy = trans_deltas[:, :2]
        if K_aware:
            assert Ks is not None
            fxfy = jnp.stack([Ks[:, 0, 0], Ks[:, 1, 1]], axis=1)
        else:
            fxfy = jnp.ones_like(vxvy)
        xy_src = trans_inits[:, :2]
        xy_tgt = ztgt * (vxvy / fxfy + xy_src / zsrc)
        trans_tgts = jnp.concatenate([xy_tgt, ztgt], axis=-1)
    elif delta_T_space == "3D":
        trans_tgts = trans_inits + trans_deltas
    else:
        raise ValueError(f"Unknown delta_T_space: {delta_T_space}")

    if "add" in scale_type:
        scale_tgts = scale_inits + scale_deltas
    else:  # *_mul: exp makes deltas zero-centered; scale_deltas = log(s/s_init)
        scale_tgts = scale_inits * jnp.exp(scale_deltas)

    if is_allo:
        ego_rot_deltas = allo_to_ego_mat(trans_tgts, rot_deltas, eps=eps)
    else:
        ego_rot_deltas = rot_deltas

    rot_tgts = ego_rot_deltas @ rot_inits
    return rot_tgts, trans_tgts, scale_tgts
