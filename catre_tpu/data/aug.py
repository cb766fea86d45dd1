"""Device-side pose/scale/point-cloud augmentation (jit-friendly).

Behavioral reference: `core/utils/pose_aug.py` (aug_poses_normal:60,
aug_scale_normal:10), `core/catre/engine/engine_utils.py` (aug_3d_bbox:107,
aug_RT:142), `core/utils/depth_aug.py:5`.

The reference draws noise on the host with numpy/torch RNG; here everything
is a pure function of a jax PRNG key so the whole batch-prep fuses into the
jitted train step.  Ladder selection ("randomly choose one std setting per
batch") matches the reference's per-batch single draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.rotations import euler_to_mat


def _choose_row(key, options: jnp.ndarray):
    """Pick one row of a (N, ...) option ladder uniformly."""
    idx = jax.random.randint(key, (), 0, options.shape[0])
    return options[idx]


def aug_poses_normal(key, poses: jnp.ndarray, std_rot: jnp.ndarray,
                     std_trans: jnp.ndarray, max_rot: float = 45.0,
                     min_z: float = 0.1, euler_deg_override=None,
                     trans_noise_override=None) -> jnp.ndarray:
    """Perturb gt poses with euler-angle + translation noise.

    Args:
      poses: (B, 3, 4)
      std_rot: (R,) ladder of rotation noise stds in degrees
      std_trans: (T, 3) ladder of translation noise stds (meters)
      euler_deg_override / trans_noise_override: replace the drawn noises
        (pre-clip degrees / meters) — golden tests drive the transform with
        the reference's exact draw.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bs = poses.shape[0]
    if euler_deg_override is not None:
        euler_deg = jnp.asarray(euler_deg_override)
    else:
        sel_rot = _choose_row(k1, jnp.atleast_1d(std_rot))
        euler_deg = jax.random.normal(k2, (bs, 3)) * sel_rot
    euler_deg = jnp.clip(euler_deg, -max_rot, max_rot)
    rot_noise = euler_to_mat(jnp.deg2rad(euler_deg))

    if trans_noise_override is not None:
        trans_noise = jnp.asarray(trans_noise_override)
    else:
        sel_trans = _choose_row(k3, jnp.atleast_2d(std_trans))
        trans_noise = jax.random.normal(k4, (bs, 3)) * sel_trans[None, :]

    R_aug = rot_noise @ poses[:, :3, :3]
    t_aug = poses[:, :3, 3] + trans_noise
    t_aug = t_aug.at[:, 2].set(jnp.maximum(t_aug[:, 2], max(min_z, 1e-4)))
    return jnp.concatenate([R_aug, t_aug[:, :, None]], axis=-1)


def aug_scale_normal(key, scales: jnp.ndarray, std_scale: jnp.ndarray,
                     min_s: float = 0.04, max_s: float = 0.45,
                     noise_override=None) -> jnp.ndarray:
    """Perturb gt scales. scales: (B, 3); std_scale: (S, 3) ladder.
    noise_override replaces the drawn noise (golden tests)."""
    k1, k2 = jax.random.split(key)
    if noise_override is not None:
        noise = jnp.asarray(noise_override)
    else:
        sel = _choose_row(k1, jnp.atleast_2d(std_scale))
        noise = jax.random.normal(k2, scales.shape) * sel[None, :]
    return jnp.clip(scales + noise, max(min_s, 1e-4), max_s)


def aug_3d_bbox(key, pcl: jnp.ndarray, pose: jnp.ndarray, scale: jnp.ndarray,
                sym_flags: jnp.ndarray, shift_min: float = 0.8,
                shift_max: float = 1.2, ratios_e=None):
    """Anisotropic object-frame rescale of cloud + gt scale.

    One (ex, ey, ez) draw per batch (ref `engine_utils.py:110-114`); y-axis
    symmetric samples average the x/z ratios.  Returns (pcl_aug, scale_aug).
    `ratios_e` overrides the drawn (ex, ey, ez) — golden tests drive the
    transform with the reference's exact draw.
    """
    e = (jnp.asarray(ratios_e) if ratios_e is not None
         else jax.random.uniform(key, (3,)) * (shift_max - shift_min) + shift_min)
    exz = (e[0] + e[2]) / 2.0
    ratios_sym = jnp.stack([exz, e[1], exz])
    ratios_nosym = e
    ratios = jnp.where(sym_flags[:, None], ratios_sym[None, :], ratios_nosym[None, :])  # (B,3)

    R = pose[:, :3, :3]
    t = pose[:, :3, 3]
    # reproject to object frame, rescale, back to camera frame
    local = jnp.einsum("bji,bpj->bpi", R, pcl - t[:, None, :])  # R^T (p - t)
    local = local * ratios[:, None, :]
    pcl_aug = jnp.einsum("bij,bpj->bpi", R, local) + t[:, None, :]
    return pcl_aug, scale * ratios


def aug_rt(key, pcl: jnp.ndarray, pose: jnp.ndarray,
           shift_t=(0.005, 0.005, 0.025), shift_rot: float = 15.0,
           rxyz_deg=None, dt_override=None):
    """Random rigid batch-level perturbation applied to cloud AND gt pose.

    One (delta_r, delta_t) draw per batch (ref `engine_utils.py:146-151`).
    Returns (pcl_aug, pose_aug). `rxyz_deg`/`dt_override` replace the draws
    (golden tests drive the transform with the reference's exact draw).
    """
    k1, k2 = jax.random.split(key)
    rxyz = (jnp.asarray(rxyz_deg) if rxyz_deg is not None
            else jax.random.uniform(k1, (3,)) * (2 * shift_rot) - shift_rot)
    # reference builds Rz @ Ry @ Rx (`get_rotation_torch`, engine_utils.py:176-185)
    shift = jnp.asarray(shift_t)
    dt = (jnp.asarray(dt_override) if dt_override is not None
          else jax.random.uniform(k2, (3,)) * (2 * shift) - shift)
    rad = jnp.deg2rad(rxyz)
    cx, sx = jnp.cos(rad[0]), jnp.sin(rad[0])
    cy, sy = jnp.cos(rad[1]), jnp.sin(rad[1])
    cz, sz = jnp.cos(rad[2]), jnp.sin(rad[2])
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    dR = Rz @ Ry @ Rx

    pcl_aug = jnp.einsum("ij,bpj->bpi", dR, pcl + dt[None, None, :])
    R_aug = jnp.einsum("ij,bjk->bik", dR, pose[:, :3, :3])
    t_aug = jnp.einsum("ij,bj->bi", dR, pose[:, :3, 3] + dt[None, :])
    return pcl_aug, jnp.concatenate([R_aug, t_aug[:, :, None]], axis=-1)


def maybe_apply(key, prob: float, fn, old_values: tuple, *fn_args):
    """With probability `prob` (whole-batch coin flip, matching
    `batching.py:78-82`) return `fn(key, *fn_args)`, else `old_values`.
    fn's return pytree must match `old_values`."""
    k_coin, k_fn = jax.random.split(key)
    coin = jax.random.uniform(k_coin) < prob
    new_values = fn(k_fn, *fn_args)
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(coin, new, old), new_values, old_values
    )


def add_noise_depth(key, depth: jnp.ndarray, level: float = 0.005) -> jnp.ndarray:
    """Gaussian depth noise on valid pixels with a uniformly drawn level
    (ref `core/utils/depth_aug.py:5-23`)."""
    k1, k2 = jax.random.split(key)
    lvl = jax.random.uniform(k1, (), minval=0.0, maxval=level)
    noise = jax.random.normal(k2, depth.shape) * lvl
    return jnp.where(depth > 0, depth + noise, depth)


def aug_depth(key, depth: jnp.ndarray, drop_depth_prob: float = 0.5,
              drop_depth_ratio: float = 0.2, add_noise_depth_prob: float = 0.9,
              add_noise_depth_level: float = 0.005) -> jnp.ndarray:
    """Full train-phase depth augmentation, device-side.

    Reference (`core/catre/datasets/data_loader.py:530-543`), in order:
      1. fill zero pixels with N(median(zero pixels), 0.1) — the median of
         the zero pixels is 0, so this is N(0, 0.1);
      2. with prob drop_depth_prob, zero a random drop_depth_ratio fraction
         of ALL pixels (keep_mask = U(0,1) > ratio);
      3. with prob add_noise_depth_prob, add N(0, U(0, level)) to pixels > 0.

    Host-side this forced train depth to ship as f32 (augmented values are
    not mm-quantized); running it on device lets train depth travel as raw
    uint16 millimeters like the test path — half the host->device bytes on
    the input pipeline's critical path.
    """
    k_fill, k_coin_drop, k_drop, k_coin_noise, k_noise = jax.random.split(key, 5)
    zero = depth == 0
    depth = jnp.where(zero, 0.1 * jax.random.normal(k_fill, depth.shape), depth)
    do_drop = jax.random.uniform(k_coin_drop) < drop_depth_prob
    keep = jax.random.uniform(k_drop, depth.shape) > drop_depth_ratio
    depth = jnp.where(do_drop & ~keep, 0.0, depth)
    do_noise = jax.random.uniform(k_coin_noise) < add_noise_depth_prob
    noisy = add_noise_depth(k_noise, depth, level=add_noise_depth_level)
    return jnp.where(do_noise, noisy, depth)
