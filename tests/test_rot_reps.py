"""Alternative rotation parameterizations (quat / log_quat / lie_vec) behind
ROT_TYPE — golden vs independent torch ports of the reference formulas
(`core/utils/quaternion_lf.py:294-318`, `core/utils/lie_algebra.py:7-78`,
`core/catre/models/model_utils.py:11-40`), round trips, and the full
refine/loss path for every rot type."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from catre_tpu import geom

RNG = np.random.default_rng(7)


def _rand_rot(b):
    a = RNG.normal(size=(b, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=1, axis2=2))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def _torch_qexp(q, eps=1e-8):
    """Port of reference quaternion_lf.qexp (latentfusion)."""
    if q.shape[1] == 4:
        s, v = torch.split(q, (1, 3), dim=-1)
    else:
        s = torch.zeros_like(q[:, :1])
        v = q
    theta = torch.norm(v, dim=-1, keepdim=True)
    exp_s = torch.exp(s)
    w = torch.cos(theta)
    xyz = 1.0 / theta.clamp(min=eps) * torch.sin(theta) * v
    return exp_s * torch.cat((w, xyz), dim=-1)


def _torch_lie_vec_to_rot(angle_axis):
    """Port of reference lie_algebra.lie_vec_to_rot (kornia/ceres)."""
    def _exact(aa, theta2, eps=1e-6):
        theta = torch.sqrt(theta2)
        wxyz = aa / (theta + eps)
        wx, wy, wz = torch.chunk(wxyz, 3, dim=1)
        ct, st = torch.cos(theta), torch.sin(theta)
        one = 1.0
        r00 = ct + wx * wx * (one - ct)
        r10 = wz * st + wx * wy * (one - ct)
        r20 = -wy * st + wx * wz * (one - ct)
        r01 = wx * wy * (one - ct) - wz * st
        r11 = ct + wy * wy * (one - ct)
        r21 = wx * st + wy * wz * (one - ct)
        r02 = wy * st + wx * wz * (one - ct)
        r12 = -wx * st + wy * wz * (one - ct)
        r22 = ct + wz * wz * (one - ct)
        return torch.cat([r00, r01, r02, r10, r11, r12, r20, r21, r22], dim=1).view(-1, 3, 3)

    def _taylor(aa):
        rx, ry, rz = torch.chunk(aa, 3, dim=1)
        one = torch.ones_like(rx)
        return torch.cat([one, -rz, ry, rz, one, -rx, -ry, rx, one], dim=1).view(-1, 3, 3)

    _aa = torch.unsqueeze(angle_axis, dim=1)
    theta2 = torch.squeeze(torch.matmul(_aa, _aa.transpose(1, 2)), dim=1)
    normal = _exact(angle_axis, theta2)
    taylor = _taylor(angle_axis)
    mask = (theta2 > 1e-6).view(-1, 1, 1).float()
    return mask * normal + (1.0 - mask) * taylor


class TestQexp:
    def test_matches_torch_3(self):
        q3 = RNG.normal(size=(64, 3)).astype(np.float32)
        ours = np.asarray(geom.qexp(jnp.asarray(q3)))
        ref = _torch_qexp(torch.from_numpy(q3)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_matches_torch_4(self):
        q4 = (RNG.normal(size=(64, 4)) * 0.5).astype(np.float32)
        ours = np.asarray(geom.qexp(jnp.asarray(q4)))
        ref = _torch_qexp(torch.from_numpy(q4)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_small_angle_stable(self):
        q = np.zeros((4, 3), dtype=np.float32)
        q[1] = [1e-10, 0, 0]
        out = np.asarray(geom.qexp(jnp.asarray(q)))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out[0], [1, 0, 0, 0], atol=1e-6)

    def test_grad_finite(self):
        q = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(geom.quat_to_mat(geom.qexp(x))))(q)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_grad_finite_at_zero(self):
        """Exactly-zero log quats (padded rows, bf16 underflow) must not NaN
        the gradient — norm() has an infinite derivative at 0 and needs the
        double-where guard."""
        q = jnp.zeros((4, 3), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(geom.quat_to_mat(geom.qexp(x))))(q)
        assert np.all(np.isfinite(np.asarray(g)))


class TestLieVec:
    def test_matches_torch(self):
        v = (RNG.normal(size=(64, 3)) * 2.0).astype(np.float32)
        v[0] = 0.0  # taylor branch
        v[1] = [1e-5, 0, 0]
        ours = np.asarray(geom.lie_vec_to_mat(jnp.asarray(v)))
        ref = _torch_lie_vec_to_rot(torch.from_numpy(v)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_valid_rotation(self):
        v = (RNG.normal(size=(32, 3)) * 2.0).astype(np.float32)
        R = np.asarray(geom.lie_vec_to_mat(jnp.asarray(v)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)

    def test_roundtrip(self):
        R = _rand_rot(32)
        v = np.asarray(geom.mat_to_lie_vec(jnp.asarray(R)))
        R2 = np.asarray(geom.lie_vec_to_mat(jnp.asarray(v)))
        np.testing.assert_allclose(R2, R, atol=1e-4)

    def test_grad_finite(self):
        v = jnp.asarray((RNG.normal(size=(8, 3)) * 0.1).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(geom.lie_vec_to_mat(x)))(v)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_grad_finite_at_zero(self):
        v = jnp.zeros((4, 3), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(geom.lie_vec_to_mat(x)))(v)
        assert np.all(np.isfinite(np.asarray(g)))
        # taylor branch derivative at 0 is the skew-matrix jacobian: each
        # component appears twice (+-1) in R -> d sum(R) / dv = 0
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


class TestDispatch:
    def test_rot_dims(self):
        # ref model_utils.py:11-25
        assert geom.get_rot_dim("ego_quat") == geom.get_rot_dim("allo_quat") == 4
        for t in ("ego_log_quat", "allo_log_quat", "ego_lie_vec", "allo_lie_vec"):
            assert geom.get_rot_dim(t) == 3
        assert geom.get_rot_dim("ego_rot6d") == geom.get_rot_dim("allo_rot6d") == 6
        with pytest.raises(ValueError):
            geom.get_rot_dim("ego_mat")

    def test_dispatch_matches_direct(self):
        q = RNG.normal(size=(16, 4)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(geom.rot_rep_to_mat(jnp.asarray(q), "ego_quat")),
            np.asarray(geom.quat_to_mat(jnp.asarray(q))))
        v = RNG.normal(size=(16, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(geom.rot_rep_to_mat(jnp.asarray(v), "allo_lie_vec")),
            np.asarray(geom.lie_vec_to_mat(jnp.asarray(v))))
        np.testing.assert_array_equal(
            np.asarray(geom.rot_rep_to_mat(jnp.asarray(v), "ego_log_quat")),
            np.asarray(geom.quat_to_mat(geom.qexp(jnp.asarray(v)))))
        d6 = RNG.normal(size=(16, 6)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(geom.rot_rep_to_mat(jnp.asarray(d6), "ego_rot6d")),
            np.asarray(geom.rot6d_to_mat(jnp.asarray(d6))))


@pytest.mark.parametrize(
    "rot_type", ["ego_quat", "ego_log_quat", "ego_lie_vec", "allo_quat", "allo_rot6d"]
)
def test_refine_and_loss_path(rot_type):
    """Full refine iteration + PM/rot losses stay finite and differentiable
    for every ROT_TYPE; head output width follows get_rot_dim."""
    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
    from catre_tpu.models.catre import refine_forward

    cfg = CATREConfig(num_pcl=64, num_kps=64, rot_type=rot_type)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))

    # head neck widths must sum to get_rot_dim(rot_type)
    d = geom.get_rot_dim(rot_type)
    nx = params["rot_head"]["rot_head_x"]["neck"]["Dense_0"]["kernel"].shape[-1]
    ny = params["rot_head"]["rot_head_y"]["neck"]["Dense_0"]["kernel"].shape[-1]
    assert nx + ny == d and nx == (d + 1) // 2

    b = 4
    rng = np.random.default_rng(3)
    R = _rand_rot(b)
    t = np.tile(np.array([0.05, -0.02, 1.0], np.float32), (b, 1))
    pose = jnp.asarray(np.concatenate([R, t[:, :, None]], axis=2))
    scale = jnp.asarray(rng.uniform(0.1, 0.3, (b, 3)).astype(np.float32))
    pcl = jnp.asarray((rng.normal(size=(b, cfg.num_pcl, 3)) * 0.1 + t[:, None, :]).astype(np.float32))
    kps = jnp.asarray((rng.normal(size=(b, cfg.num_kps, 3)) * 0.3).astype(np.float32))
    K = jnp.asarray(np.tile(np.array(
        [[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]], np.float32), (b, 1, 1)))

    def loss_fn(p):
        new_pose, new_scale = refine_forward(model, p, cfg, pcl, kps, pose, scale, K)
        # simple pose-matching surrogate exercising R through the rep conversion
        tgt = jnp.eye(3)[None]
        return (jnp.mean(jnp.square(new_pose[:, :3, :3] - tgt))
                + jnp.mean(jnp.square(new_pose[:, :3, 3] - 1.0))
                + jnp.mean(jnp.square(new_scale)))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)

    # predicted rotation block must be a valid rotation matrix
    new_pose, _ = refine_forward(model, params, cfg, pcl, kps, pose, scale, K)
    Rp = np.asarray(new_pose[:, :3, :3])
    eye = np.einsum("bij,bkj->bik", Rp, Rp)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (b, 1, 1)), atol=1e-4)


def test_config_rot_dim_validation():
    """Build-time failure on inconsistent INIT_CFG.rot_dim vs ROT_TYPE."""
    from catre_tpu.config.loader import load_config
    from catre_tpu.config.build import model_config_from
    import os.path as osp

    cfg_path = osp.join(
        osp.dirname(__file__), "..", "catre_tpu", "configs", "nocs_real",
        "aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py")
    cfg = load_config(cfg_path)
    cfg.MODEL.CATRE.ROT_HEAD.ROT_TYPE = "ego_quat"  # rot_dim=3 in INIT_CFG -> mismatch
    with pytest.raises(ValueError, match="inconsistent"):
        model_config_from(cfg)
    cfg.MODEL.CATRE.ROT_HEAD.INIT_CFG["rot_dim"] = 2
    mc = model_config_from(cfg)
    assert mc.rot_type == "ego_quat" and mc.rot_out_dim == 4

    # fused kernels gate to rot6d with a fallback warning, not a crash
    cfg.MODEL.FUSED_HEADS = True
    mc = model_config_from(cfg)
    assert mc.fused_heads is False
