"""Gradient parity: the full differentiable path (input prep -> shared
encoder -> heads -> composition -> shipped losses) must produce the same
parameter gradients as an independent torch implementation on identical
weights and inputs. This is the training-dynamics analogue of the forward
parity tests."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from catre_tpu.losses import LossConfig, catre_loss
from catre_tpu.geom import axis_symmetry_rotation_bank, euler_to_mat
from catre_tpu.models import CATREConfig, CATREDisRShared
from catre_tpu.models.catre import refine_forward
from catre_tpu.utils.checkpoint import torch_state_dict_to_params

from torch_mirror import TorchCATRE

RNG = np.random.default_rng(77)


def _torch_compose(rot_d, trans_d, scale_d, pose_init, scale_init, K):
    """Image-space K-aware cosypose composition + iter_add scale (torch)."""
    # rot6d -> mat
    x_raw, y_raw = rot_d[:, :3], rot_d[:, 3:]
    x = torch.nn.functional.normalize(x_raw, dim=-1)
    z = torch.nn.functional.normalize(torch.cross(x, y_raw, dim=-1), dim=-1)
    y = torch.cross(z, x, dim=-1)
    Rd = torch.stack([x, y, z], dim=-1)

    R0 = pose_init[:, :3, :3]
    t0 = pose_init[:, :3, 3]
    zsrc = t0[:, 2:3]
    ztgt = trans_d[:, 2:3] * zsrc
    fxfy = torch.stack([K[:, 0, 0], K[:, 1, 1]], dim=1)
    xy = ztgt * (trans_d[:, :2] / fxfy + t0[:, :2] / zsrc)
    t_new = torch.cat([xy, ztgt], dim=1)
    s_new = scale_init + scale_d
    R_new = Rd @ R0
    return R_new, t_new, s_new


def _torch_loss(model, batch):
    pcl = torch.from_numpy(batch["pcl"])
    kps = torch.from_numpy(batch["kps"])
    pose_est = torch.from_numpy(batch["pose_est"])
    scale_est = torch.from_numpy(batch["scale_est"])
    gt_pose = torch.from_numpy(batch["gt_pose"])
    gt_scale = torch.from_numpy(batch["gt_scale"])
    K = torch.from_numpy(batch["K"])

    r_est = pose_est[:, :3, :3]
    t_est = pose_est[:, :3, 3]
    tfd_kps = torch.einsum("bij,bpj->bpi", r_est, kps * scale_est[:, None, :])
    x = pcl - t_est[:, None, :]

    rot_d, trans_d, scale_d = model(
        x.permute(0, 2, 1), tfd_kps.permute(0, 2, 1), scale_est
    )
    R, t, s = _torch_compose(rot_d, trans_d, scale_d, pose_est, scale_est, K)

    gt_R = gt_pose[:, :3, :3]
    gt_t = gt_pose[:, :3, 3]
    # PM loss (L1, r_only, with_scale, nosym)
    est = torch.einsum("bij,bpj->bpi", R, kps * s[:, None, :])
    tgt = torch.einsum("bij,bpj->bpi", gt_R, kps * gt_scale[:, None, :])
    loss = 3.0 * torch.nn.functional.l1_loss(est, tgt)
    # angular rot loss (all samples non-symmetric here)
    m = torch.einsum("bij,bkj->bik", R, gt_R)
    tr = m.diagonal(dim1=1, dim2=2).sum(-1)
    loss = loss + ((1 - (tr - 1) / 2) / 2).mean()
    # disentangled trans + scale L1
    loss = loss + torch.nn.functional.l1_loss(t[:, :2], gt_t[:, :2])
    loss = loss + torch.nn.functional.l1_loss(t[:, 2], gt_t[:, 2])
    loss = loss + torch.nn.functional.l1_loss(s, gt_scale)
    return loss


def test_gradient_parity_with_torch():
    B, P = 3, 96
    cfg = CATREConfig(num_pcl=P, num_kps=P)
    # TorchCATRE() draws weights from torch's GLOBAL rng — without an
    # explicit seed the drawn weights (and thus whether the tight 1e-4 loss
    # tolerance holds) depend on which other tests ran first
    torch.manual_seed(7)
    tm = TorchCATRE()
    # reference-format num_points for conv_p differs from default 2048
    tm.rot_head.rot_head_x.conv_p = torch.nn.Conv1d(2 * P, 1, 1, bias=True)
    tm.rot_head.rot_head_y.conv_p = torch.nn.Conv1d(2 * P, 1, 1, bias=True)
    params = torch_state_dict_to_params(tm.state_dict())

    # synthetic batch
    euler = RNG.uniform(-1, 1, size=(B, 3)).astype(np.float32)
    R0 = np.asarray(euler_to_mat(jnp.asarray(euler)))
    t0 = np.stack([RNG.uniform(-0.1, 0.1, B), RNG.uniform(-0.1, 0.1, B),
                   RNG.uniform(0.8, 1.2, B)], axis=1).astype(np.float32)
    batch = {
        "pcl": (RNG.normal(size=(B, P, 3)) * 0.1).astype(np.float32) + t0[:, None, :],
        "kps": (RNG.normal(size=(B, P, 3)) * 0.3).astype(np.float32),
        "pose_est": np.concatenate([R0, t0[:, :, None]], axis=2).astype(np.float32),
        "scale_est": RNG.uniform(0.1, 0.3, (B, 3)).astype(np.float32),
        "gt_pose": np.concatenate(
            [np.asarray(euler_to_mat(jnp.asarray(euler + 0.05))), (t0 + 0.01)[:, :, None]],
            axis=2).astype(np.float32),
        "gt_scale": RNG.uniform(0.1, 0.3, (B, 3)).astype(np.float32),
        "K": np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]],
                              np.float32), (B, 1, 1)),
    }

    # ---- torch gradients
    loss_t = _torch_loss(tm, batch)
    loss_t.backward()
    torch_grads = {k: v.grad.detach().numpy() for k, v in tm.named_parameters()
                   if v.grad is not None}

    # ---- jax gradients
    model = CATREDisRShared(cfg)
    loss_cfg = LossConfig(pm_loss_sym=False)  # nosym batch
    sym_bank = jnp.asarray(axis_symmetry_rotation_bank(max_sym_disc_step=0.1))

    def loss_fn(p):
        pose, scale = refine_forward(
            model, p, cfg, jnp.asarray(batch["pcl"]), jnp.asarray(batch["kps"]),
            jnp.asarray(batch["pose_est"]), jnp.asarray(batch["scale_est"]),
            jnp.asarray(batch["K"]), None,
        )
        ld = catre_loss(
            loss_cfg, out_rot=pose[:, :3, :3], out_trans=pose[:, :3, 3],
            out_scale=scale, gt_rot=jnp.asarray(batch["gt_pose"][:, :3, :3]),
            gt_trans=jnp.asarray(batch["gt_pose"][:, :3, 3]),
            gt_scale=jnp.asarray(batch["gt_scale"]),
            obj_kps=jnp.asarray(batch["kps"]),
            sym_flags=jnp.zeros(B, dtype=bool), sym_bank=sym_bank,
        )
        return sum(ld.values())

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t)) < 1e-4, (float(loss_j), float(loss_t))

    # compare a representative set of gradient leaves (flax (in,out) = torch.T)
    checks = [
        ("pcl_net.conv1.weight", grads["pcl_net"]["conv1"]["Dense_0"]["kernel"], True),
        ("pcl_net.conv4.weight", grads["pcl_net"]["conv4"]["Dense_0"]["kernel"], True),
        ("pcl_net.stn.fc3.weight", grads["pcl_net"]["stn"]["fc3"]["Dense_0"]["kernel"], True),
        ("pcl_net.fstn.conv1.weight", grads["pcl_net"]["fstn"]["conv1"]["Dense_0"]["kernel"], True),
        ("rot_head.rot_head_x.layers.0.weight", grads["rot_head"]["rot_head_x"]["layer0_kernel"], True),
        ("rot_head.rot_head_x.layers.1.weight", grads["rot_head"]["rot_head_x"]["gn0"]["scale"], False),
        ("rot_head.rot_head_y.neck.0.weight", grads["rot_head"]["rot_head_y"]["neck"]["Dense_0"]["kernel"], True),
        ("ts_head.fc_t.weight", grads["ts_head"]["fc_t"]["Dense_0"]["kernel"], True),
        ("ts_head.fc_s.bias", grads["ts_head"]["fc_s"]["Dense_0"]["bias"], False),
        ("ts_head.linears.0.weight", grads["ts_head"]["linear0"]["Dense_0"]["kernel"], True),
    ]
    for tname, jgrad, transpose in checks:
        tg = torch_grads[tname]
        if tg.ndim == 3:  # Conv1d (out, in, 1)
            tg = tg[:, :, 0]
        jg = np.asarray(jgrad)
        if transpose:
            jg = jg.T
        np.testing.assert_allclose(jg, tg, atol=2e-4, err_msg=tname)

    # conv_p gradients (flat point_weight <-> torch (1, P, 1))
    np.testing.assert_allclose(
        np.asarray(grads["rot_head"]["rot_head_x"]["point_weight"]),
        torch_grads["rot_head.rot_head_x.conv_p.weight"][0, :, 0], atol=2e-4,
    )
