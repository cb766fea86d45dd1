"""CATRE top module: shared PointNet over observed cloud + transformed prior
keypoints, disentangled delta heads, pose/scale composition.

Behavioral reference: `core/catre/models/CATRE_disR_shared.py:31-166`.
TPU-native design notes:
  - both clouds are encoded in ONE batched encoder call (stacked along the
    batch axis) instead of two sequential calls — one bigger matmul chain, no
    duplicated weights traffic from HBM;
  - the full refine iteration (keypoint transform, zero-centering, encoder,
    heads, composition) is a pure function `refine_forward` suitable for
    `jax.lax.scan` over refine iterations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..geom.rotations import get_rot_dim, rot_rep_to_mat
from ..geom.transforms import transform_normed_pts
from .compose import pose_scale_from_delta_init
from .heads import ConvOutPerRotHead, FCTransSizeHead
from .pointnet import PointNetFeat


@dataclass(frozen=True)
class CATREConfig:
    """Static model hyper-parameters (shipped NOCS-REAL config values)."""

    num_pcl: int = 1024
    num_kps: int = 1024
    pclnet_out_dim: int = 1024
    feature_transform: bool = True
    rot_feat_dim: int = 256
    rot_num_layers: int = 2
    rot_num_gn_groups: int = 32
    ts_feat_dim: int = 256
    ts_num_layers: int = 2
    ts_num_gn_groups: int = 32
    ts_with_kps_feature: bool = False
    ts_with_init_scale: bool = True
    ts_with_init_trans: bool = False
    rot_type: str = "ego_rot6d"          # {ego|allo}_{rot6d|quat|log_quat|lie_vec}
    scale_type: str = "iter_add"         # {iter|mean}_{add|mul}
    delta_t_space: str = "image"         # image | 3D
    delta_t_weight: float = 1.0
    delta_z_style: str = "cosypose"      # cosypose | deepim
    t_transform_k_aware: bool = True
    zero_center_input: bool = True
    refine_scale: bool = True
    dtype: Any = None                     # compute dtype (None = float32)
    fused_heads: bool = False             # Pallas fused rot head (inference)
    fused_heads_train: bool = False       # custom-VJP fused rot head (training)
    fused_encoder_train: bool = False     # custom-VJP fused encoder epilogues
    fused_block_size: int = 1             # objects per rot-head grid step
    fused_encoder: bool = False           # Pallas encoder columns (inference)
    fused_encoder_epilogue: bool = True   # fuse the ->1024->max tails (inference)

    @property
    def is_allo(self) -> bool:
        return "allo" in self.rot_type

    @property
    def rot_out_dim(self) -> int:
        """Total predicted-rotation width (ref model_utils.py:11-25)."""
        return get_rot_dim(self.rot_type)

    @property
    def is_rot6d(self) -> bool:
        return self.rot_type.endswith("rot6d")


class CATREDisRShared(nn.Module):
    """Delta-prediction network (encoder + heads). Composition is done by
    `refine_forward` so the module stays a pure delta predictor.

    Inputs (points-last):
      x:        (B, P, 3)   observed cloud (already zero-centered if cfg says)
      tfd_kps:  (B, K, 3)   prior keypoints transformed by current s/R(,t)
      init_scale: (B, 3)
      init_trans: (B, 3)    (only used when ts_with_init_trans)
    Outputs:
      rot_deltas6 (B, 6), trans_deltas (B, 3), scale_deltas (B, 3)
    """

    cfg: CATREConfig

    @nn.compact
    def __call__(self, x, tfd_kps, init_scale, init_trans=None):
        cfg = self.cfg
        B = x.shape[0]
        pcl_net = PointNetFeat(
            out_dim=cfg.pclnet_out_dim,
            global_feat=False,
            feature_transform=cfg.feature_transform,
            return_parts=True,
            dtype=cfg.dtype,
            name="pcl_net",
        )
        # Shared weights over both clouds (ref calls the net twice with the
        # same weights, CATRE_disR_shared.py:66-67). When point counts match
        # (the shipped config: 1024/1024) both clouds run in ONE batched
        # encoder call — bigger matmuls, weights read from HBM once. The
        # encoder returns FACTORED features (per-point 64-d, per-cloud
        # 1024-d global); the reference's (B, 1088, P) concat is never built.
        if x.shape[1] == tfd_kps.shape[1]:
            both = jnp.concatenate([x, tfd_kps], axis=0)  # (2B, P, 3)
            pf, gf = pcl_net(both)  # (2B, P, 64), (2B, out_dim)
            pcl_pf, kps_pf = pf[:B], pf[B:]
            g_pcl, g_kps = gf[:B], gf[B:]
        else:
            pcl_pf, g_pcl = pcl_net(x)
            kps_pf, g_kps = pcl_net(tfd_kps)

        # flat feature = max over points of [global ⊕ point] = [g, max(point)]
        flat_pcl_feat = jnp.concatenate([g_pcl, jnp.max(pcl_pf, axis=1)], axis=1)
        if cfg.ts_with_kps_feature:
            flat_kps_feat = jnp.concatenate([g_kps, jnp.max(kps_pf, axis=1)], axis=1)
            ts_feat = jnp.concatenate([flat_pcl_feat, flat_kps_feat], axis=1)
        else:
            ts_feat = flat_pcl_feat
        if cfg.ts_with_init_scale:
            ts_feat = jnp.concatenate([ts_feat, init_scale.astype(ts_feat.dtype)], axis=1)
        if cfg.ts_with_init_trans:
            assert init_trans is not None
            ts_feat = jnp.concatenate([ts_feat, init_trans.astype(ts_feat.dtype)], axis=1)

        trans_deltas, scale_deltas = FCTransSizeHead(
            feat_dim=cfg.ts_feat_dim,
            num_layers=cfg.ts_num_layers,
            num_gn_groups=cfg.ts_num_gn_groups,
            dtype=cfg.dtype,
            name="ts_head",
        )(ts_feat)

        # rot head consumes per-point features of both clouds concatenated
        # along the POINT axis (ref `CATRE_disR_shared.py:86`), in factored form.
        point_feats = jnp.concatenate([pcl_pf, kps_pf], axis=1)  # (B, P+K, 64)
        d = cfg.rot_out_dim
        rot_deltas6 = ConvOutPerRotHead(
            in_global=cfg.pclnet_out_dim,
            feat_dim=cfg.rot_feat_dim,
            num_layers=cfg.rot_num_layers,
            rot_dim=(d + 1) // 2,
            rot_dim_y=d // 2,
            num_gn_groups=cfg.rot_num_gn_groups,
            num_points=cfg.num_pcl + cfg.num_kps,
            dtype=cfg.dtype,
            name="rot_head",
        )(point_feats, g_pcl, g_kps, x.shape[1])

        return (
            rot_deltas6.astype(jnp.float32),
            trans_deltas.astype(jnp.float32),
            scale_deltas.astype(jnp.float32),
        )


def prepare_inputs(cfg: CATREConfig, pcl, obj_kps, pose_est, scale_est):
    """Build the network inputs for one refine iteration.

    Matches `batch_updater` (`core/catre/engine/batching.py:87-146`):
      tfd_kps = R_est @ (kps * s_est) (+ t_est unless zero-center)
      x = pcl - t_est (zero-center) or pcl

    Args:
      pcl: (B, P, 3); obj_kps: (B, K, 3) normalized prior keypoints
      pose_est: (B, 3, 4); scale_est: (B, 3)
    """
    r_est = pose_est[:, :3, :3]
    t_est = pose_est[:, :3, 3]
    tfd_kps = transform_normed_pts(
        obj_kps, r_est, t=None if cfg.zero_center_input else t_est, scale=scale_est
    )
    if cfg.zero_center_input:
        x = pcl - t_est[:, None, :]
    else:
        x = pcl
    return x, tfd_kps


def delta_forward_fused(cfg: CATREConfig, params, x, tfd_kps, init_scale, init_trans):
    """Inference-path delta prediction using the fused Pallas rot-head kernel
    (ops/pallas_heads.py). Encoder and TS head run as flax submodule applies;
    same numerics as CATREDisRShared.__call__ to float tolerance."""
    import jax

    from ..ops.pallas_heads import fused_conv_per_rot_head
    from .heads import FCTransSizeHead
    from .pointnet import PointNetFeat

    B = x.shape[0]
    interpret = jax.devices()[0].platform == "cpu"
    # encoder defaults to the XLA path: its batched (2B*P, C) matmuls already
    # run near the roofline (a naive per-cloud Pallas grid measured SLOWER,
    # 3.7k vs 4.3k obj/s). cfg.fused_encoder switches to the cloud-blocked
    # Pallas columns (ops/pallas_encoder.py).
    if cfg.fused_encoder:
        from ..ops.pallas_encoder import pointnet_forward_fused

        def encode(xx):
            return pointnet_forward_fused(
                params["pcl_net"], xx, feature_transform=cfg.feature_transform,
                interpret=interpret,
            )
    elif cfg.fused_encoder_epilogue:
        # XLA keeps the big GEMMs; only the three ->1024->max tails run in
        # Pallas so the (N*P, 1024) activations never hit HBM
        from ..ops.pallas_encoder_epilogue import pointnet_encode_fused

        def encode(xx):
            return pointnet_encode_fused(
                params["pcl_net"], xx, feature_transform=cfg.feature_transform,
                interpret=interpret,
                compute_dtype=jnp.float32 if interpret else cfg.dtype or jnp.float32,
            )
    else:
        enc = PointNetFeat(
            out_dim=cfg.pclnet_out_dim, global_feat=False,
            feature_transform=cfg.feature_transform, return_parts=True, dtype=cfg.dtype,
        )

        def encode(xx):
            return enc.apply({"params": params["pcl_net"]}, xx)

    both = jnp.concatenate([x, tfd_kps], axis=0) if x.shape[1] == tfd_kps.shape[1] else None
    if both is not None:
        pf, gf = encode(both)
        pcl_pf, kps_pf = pf[:B], pf[B:]
        g_pcl, g_kps = gf[:B], gf[B:]
    else:
        pcl_pf, g_pcl = encode(x)
        kps_pf, g_kps = encode(tfd_kps)

    flat_pcl_feat = jnp.concatenate([g_pcl, jnp.max(pcl_pf, axis=1)], axis=1)
    ts_feat = flat_pcl_feat
    if cfg.ts_with_kps_feature:
        flat_kps_feat = jnp.concatenate([g_kps, jnp.max(kps_pf, axis=1)], axis=1)
        ts_feat = jnp.concatenate([flat_pcl_feat, flat_kps_feat], axis=1)
    if cfg.ts_with_init_scale:
        ts_feat = jnp.concatenate([ts_feat, init_scale.astype(ts_feat.dtype)], axis=1)
    if cfg.ts_with_init_trans:
        ts_feat = jnp.concatenate([ts_feat, init_trans.astype(ts_feat.dtype)], axis=1)
    ts_head = FCTransSizeHead(
        feat_dim=cfg.ts_feat_dim, num_layers=cfg.ts_num_layers,
        num_gn_groups=cfg.ts_num_gn_groups, dtype=cfg.dtype,
    )
    trans_deltas, scale_deltas = ts_head.apply({"params": params["ts_head"]}, ts_feat)

    point_feats = jnp.concatenate([pcl_pf, kps_pf], axis=1)
    if cfg.fused_block_size > 1 and B % cfg.fused_block_size == 0:
        from ..ops.pallas_heads_blocked import fused_conv_per_rot_head_blocked

        rot_deltas6 = fused_conv_per_rot_head_blocked(
            point_feats, g_pcl, g_kps, params["rot_head"], n_pcl=x.shape[1],
            block_size=cfg.fused_block_size, interpret=interpret,
        )
    else:
        rot_deltas6 = fused_conv_per_rot_head(
            point_feats, g_pcl, g_kps, params["rot_head"], n_pcl=x.shape[1],
            interpret=interpret,
        )
    return (
        rot_deltas6.astype(jnp.float32),
        trans_deltas.astype(jnp.float32),
        scale_deltas.astype(jnp.float32),
    )


def delta_forward_fused_train(cfg: CATREConfig, params, x, tfd_kps, init_scale,
                              init_trans):
    """Training-path delta prediction: flax encoder/TS head (autodiff) with
    the custom-VJP fused rot head (ops/pallas_heads_vjp.py — Pallas forward
    and backward, gradients validated against autodiff)."""
    import jax

    from ..ops.pallas_heads_vjp import fused_rot_head_train
    from .heads import FCTransSizeHead
    from .pointnet import PointNetFeat

    B = x.shape[0]
    interpret = jax.devices()[0].platform == "cpu"
    if cfg.fused_encoder_train:
        # custom-VJP fused ->1024->max tails: the (N*P, 1024) activations and
        # the max-backward mask never reach HBM (ops/pallas_encoder_epilogue_vjp)
        from ..ops.pallas_encoder_epilogue_vjp import pointnet_encode_fused_train

        def encode(xx):
            return pointnet_encode_fused_train(
                params["pcl_net"], xx, feature_transform=cfg.feature_transform,
                interpret=interpret,
                compute_dtype=jnp.float32 if interpret else cfg.dtype or jnp.float32,
            )
    else:
        enc = PointNetFeat(
            out_dim=cfg.pclnet_out_dim, global_feat=False,
            feature_transform=cfg.feature_transform, return_parts=True, dtype=cfg.dtype,
        )

        def encode(xx):
            return enc.apply({"params": params["pcl_net"]}, xx)
    both = jnp.concatenate([x, tfd_kps], axis=0) if x.shape[1] == tfd_kps.shape[1] else None
    if both is not None:
        pf, gf = encode(both)
        pcl_pf, kps_pf = pf[:B], pf[B:]
        g_pcl, g_kps = gf[:B], gf[B:]
    else:
        pcl_pf, g_pcl = encode(x)
        kps_pf, g_kps = encode(tfd_kps)

    flat_pcl_feat = jnp.concatenate([g_pcl, jnp.max(pcl_pf, axis=1)], axis=1)
    ts_feat = flat_pcl_feat
    if cfg.ts_with_kps_feature:
        flat_kps_feat = jnp.concatenate([g_kps, jnp.max(kps_pf, axis=1)], axis=1)
        ts_feat = jnp.concatenate([flat_pcl_feat, flat_kps_feat], axis=1)
    if cfg.ts_with_init_scale:
        ts_feat = jnp.concatenate([ts_feat, init_scale.astype(ts_feat.dtype)], axis=1)
    if cfg.ts_with_init_trans:
        ts_feat = jnp.concatenate([ts_feat, init_trans.astype(ts_feat.dtype)], axis=1)
    ts_head = FCTransSizeHead(
        feat_dim=cfg.ts_feat_dim, num_layers=cfg.ts_num_layers,
        num_gn_groups=cfg.ts_num_gn_groups, dtype=cfg.dtype,
    )
    trans_deltas, scale_deltas = ts_head.apply({"params": params["ts_head"]}, ts_feat)

    point_feats = jnp.concatenate([pcl_pf, kps_pf], axis=1)
    rot_deltas6 = fused_rot_head_train(
        point_feats, g_pcl, g_kps, params["rot_head"], x.shape[1], interpret
    )
    return (
        rot_deltas6.astype(jnp.float32),
        trans_deltas.astype(jnp.float32),
        scale_deltas.astype(jnp.float32),
    )


def refine_forward(model: CATREDisRShared, params, cfg: CATREConfig,
                   pcl, obj_kps, pose_est, scale_est, K, mean_scales=None):
    """One full refine iteration: inputs -> deltas -> composed pose/scale.

    Mirrors `model.forward` + `pose_scale_from_delta_init`
    (`CATRE_disR_shared.py:40-121`). Returns (pose (B,3,4), scale (B,3)).
    """
    x, tfd_kps = prepare_inputs(cfg, pcl, obj_kps, pose_est, scale_est)
    if cfg.dtype is not None:
        x = x.astype(cfg.dtype)
        tfd_kps = tfd_kps.astype(cfg.dtype)
    # the fused Pallas rot-head kernels hard-code the shipped 3+3 rot6d neck
    if cfg.fused_heads_train and cfg.is_rot6d:
        rot_deltas6, trans_deltas, scale_deltas = delta_forward_fused_train(
            cfg, params, x, tfd_kps, scale_est, pose_est[:, :3, 3]
        )
    elif cfg.fused_heads and cfg.is_rot6d:
        rot_deltas6, trans_deltas, scale_deltas = delta_forward_fused(
            cfg, params, x, tfd_kps, scale_est, pose_est[:, :3, 3]
        )
    else:
        rot_deltas6, trans_deltas, scale_deltas = model.apply(
            {"params": params}, x, tfd_kps, scale_est, pose_est[:, :3, 3]
        )
    rot_m_deltas = rot_rep_to_mat(rot_deltas6, cfg.rot_type)
    scale_inits = scale_est if "iter" in cfg.scale_type else mean_scales
    pred_rot, pred_trans, pred_scale = pose_scale_from_delta_init(
        rot_deltas=rot_m_deltas,
        trans_deltas=trans_deltas,
        scale_deltas=scale_deltas,
        rot_inits=pose_est[:, :3, :3],
        trans_inits=pose_est[:, :3, 3],
        scale_inits=scale_inits,
        Ks=K,
        K_aware=cfg.t_transform_k_aware,
        delta_T_space=cfg.delta_t_space,
        delta_T_weight=cfg.delta_t_weight,
        delta_z_style=cfg.delta_z_style,
        is_allo=cfg.is_allo,
        scale_type=cfg.scale_type,
    )
    if not cfg.refine_scale:
        pred_scale = scale_est
    pose = jnp.concatenate([pred_rot, pred_trans[:, :, None]], axis=-1)
    return pose, pred_scale


def init_params(model: CATREDisRShared, cfg: CATREConfig, rng):
    """Initialize parameters with dummy static-shape inputs."""
    x = jnp.zeros((1, cfg.num_pcl, 3), dtype=jnp.float32)
    kps = jnp.zeros((1, cfg.num_kps, 3), dtype=jnp.float32)
    s = jnp.ones((1, 3), dtype=jnp.float32)
    t = jnp.zeros((1, 3), dtype=jnp.float32)
    return model.init(rng, x, kps, s, t)["params"]
