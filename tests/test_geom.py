"""Golden tests for catre_tpu.geom against independent torch/numpy
implementations of the reference formulas."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from catre_tpu import geom

RNG = np.random.default_rng(0)


def _rand_rot(b):
    """Random rotation matrices via QR."""
    a = RNG.normal(size=(b, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=1, axis2=2))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def _torch_rot6d_to_mat(d6):
    x_raw, y_raw = d6[..., :3], d6[..., 3:6]
    x = F.normalize(x_raw, p=2, dim=-1)
    z = F.normalize(torch.cross(x, y_raw, dim=-1), p=2, dim=-1)
    y = torch.cross(z, x, dim=-1)
    return torch.stack((x, y, z), dim=-1)


class TestRot6d:
    def test_matches_torch(self):
        d6 = RNG.normal(size=(32, 6)).astype(np.float32)
        ours = np.asarray(geom.rot6d_to_mat(jnp.asarray(d6)))
        ref = _torch_rot6d_to_mat(torch.from_numpy(d6)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_valid_rotation(self):
        d6 = RNG.normal(size=(16, 6)).astype(np.float32)
        R = np.asarray(geom.rot6d_to_mat(jnp.asarray(d6)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_roundtrip(self):
        R = _rand_rot(16)
        d6 = geom.mat_to_rot6d(jnp.asarray(R))
        R2 = np.asarray(geom.rot6d_to_mat(d6))
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestQuat:
    def test_quat_to_mat_matches_formula(self):
        q = RNG.normal(size=(32, 4)).astype(np.float32)
        ours = np.asarray(geom.quat_to_mat(jnp.asarray(q)))
        # reference formula (pose_utils.py:349) on normalized quats
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
        ref = np.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=1,
        ).reshape(-1, 3, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_roundtrip(self):
        R = _rand_rot(64)
        q = geom.mat_to_quat(jnp.asarray(R))
        R2 = np.asarray(geom.quat_to_mat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestEuler:
    def test_small_angles(self):
        # euler2mat_torch: R = Rx @ Ry @ Rz
        ang = RNG.normal(size=(8, 3)).astype(np.float32)
        ours = np.asarray(geom.euler_to_mat(jnp.asarray(ang)))

        def rx(a):
            return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

        def ry(a):
            return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

        def rz(a):
            return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

        ref = np.stack([rx(a[0]) @ ry(a[1]) @ rz(a[2]) for a in ang])
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAlloEgo:
    def test_identity_on_axis(self):
        # object exactly on optical axis -> no compensation
        t = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
        R = _rand_rot(1)
        out = np.asarray(geom.allo_to_ego_mat(jnp.asarray(t), jnp.asarray(R)))
        np.testing.assert_allclose(out, R, atol=1e-3)

    def test_compensation_angle(self):
        # allo rot = I; ego rot should rotate cam_ray onto obj_ray
        t = np.array([[0.3, -0.2, 1.0]], dtype=np.float32)
        out = np.asarray(geom.allo_to_ego_mat(jnp.asarray(t), jnp.eye(3, dtype=np.float32)[None]))
        obj_ray = t[0] / np.linalg.norm(t[0])
        np.testing.assert_allclose(out[0] @ np.array([0, 0, 1.0]), obj_ray, atol=1e-3)


class TestTransforms:
    def test_transform_normed_pts(self):
        pts = RNG.normal(size=(4, 100, 3)).astype(np.float32)
        R = _rand_rot(4)
        t = RNG.normal(size=(4, 3)).astype(np.float32)
        s = RNG.uniform(0.1, 2.0, size=(4, 3)).astype(np.float32)
        ours = np.asarray(
            geom.transform_normed_pts(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t), jnp.asarray(s))
        )
        ref = np.einsum("bij,bpj->bpi", R, pts * s[:, None]) + t[:, None]
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_backproject(self):
        K = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]], dtype=np.float32)
        depth = RNG.uniform(0.5, 2.0, size=(48, 64)).astype(np.float32)
        cloud = np.asarray(geom.backproject(jnp.asarray(depth), jnp.asarray(K)))
        # reproject and check pixel coordinates
        pts = cloud.reshape(-1, 3)
        uv = (pts @ K.T)
        uv = uv[:, :2] / uv[:, 2:3]
        V, U = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
        np.testing.assert_allclose(uv[:, 0], U.ravel(), atol=1e-2)
        np.testing.assert_allclose(uv[:, 1], V.ravel(), atol=1e-2)
        np.testing.assert_allclose(cloud[..., 2], depth)

    def test_project_roundtrip(self):
        K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]], dtype=np.float32)
        pts = RNG.normal(size=(50, 3)).astype(np.float32) * 0.1
        R = _rand_rot(1)[0]
        t = np.array([0.1, -0.05, 1.2], dtype=np.float32)
        uv = np.asarray(geom.project_pts(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)))
        cam = pts @ R.T + t
        ref = (cam @ K.T)
        ref = ref[:, :2] / ref[:, 2:3]
        np.testing.assert_allclose(uv, ref, atol=1e-4)


class TestSymmetry:
    def test_bank_shape(self):
        bank = geom.axis_symmetry_rotation_bank(max_sym_disc_step=0.01)
        assert bank.shape == (315, 3, 3)  # identity + 314
        np.testing.assert_allclose(bank[0], np.eye(3), atol=1e-7)
        # all are proper y-rotations: preserve the y axis
        ys = bank @ np.array([0, 1, 0], dtype=np.float32)
        np.testing.assert_allclose(ys, np.tile([0, 1, 0], (315, 1)), atol=1e-6)

    def test_closest_rot_reduces_error(self):
        bank = jnp.asarray(geom.axis_symmetry_rotation_bank(max_sym_disc_step=0.01))
        gt = jnp.asarray(_rand_rot(16))
        # pred = gt rotated by a random y rotation -> closest should be ~pred
        thetas = RNG.uniform(0, 2 * np.pi, size=16).astype(np.float32)
        yrots = np.stack(
            [
                np.array(
                    [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
                    dtype=np.float32,
                )
                for a in thetas
            ]
        )
        pred = jnp.asarray(np.einsum("bij,bjk->bik", np.asarray(gt), yrots))
        sym = jnp.ones(16, dtype=bool)
        closest = geom.closest_rot_batch(pred, gt, sym, bank)
        err = np.asarray(geom.rotation_error_deg(pred, closest))
        assert err.max() < 1.0  # 315-step discretization => < ~0.57 deg
        # non-sym flag: unchanged gt
        nosym = geom.closest_rot_batch(pred, gt, jnp.zeros(16, dtype=bool), bank)
        np.testing.assert_allclose(np.asarray(nosym), np.asarray(gt), atol=1e-6)

    def test_matches_reference_host_loop(self):
        bank = geom.axis_symmetry_rotation_bank(max_sym_disc_step=0.01)
        gt = _rand_rot(8)
        pred = _rand_rot(8)

        def re_np(r1, r2):
            tr = np.trace(r1 @ r2.T)
            return np.degrees(np.arccos(np.clip(0.5 * (tr - 1), -1, 1)))

        # reference loop (pose_utils.py:472): candidates gt @ S_k
        expected = []
        for i in range(8):
            best, best_err = gt[i], re_np(pred[i], gt[i])
            for S in bank[1:]:
                cand = gt[i] @ S
                e = re_np(pred[i], cand)
                if e < best_err:
                    best, best_err = cand, e
            expected.append(best)
        got = np.asarray(
            geom.closest_rot_batch(
                jnp.asarray(pred), jnp.asarray(gt), jnp.ones(8, dtype=bool), jnp.asarray(bank)
            )
        )
        np.testing.assert_allclose(got, np.stack(expected), atol=1e-4)


class TestErrors:
    def test_re_te(self):
        R1, R2 = _rand_rot(16), _rand_rot(16)
        t1 = RNG.normal(size=(16, 3)).astype(np.float32)
        t2 = RNG.normal(size=(16, 3)).astype(np.float32)
        re_ours = np.asarray(geom.rotation_error_deg(jnp.asarray(R1), jnp.asarray(R2)))
        te_ours = np.asarray(geom.translation_error(jnp.asarray(t1), jnp.asarray(t2)))
        for i in range(16):
            tr = np.trace(R1[i] @ R2[i].T)
            re_ref = np.degrees(np.arccos(np.clip(0.5 * (tr - 1), -1, 1)))
            assert abs(re_ours[i] - re_ref) < 1e-3
            assert abs(te_ours[i] - np.linalg.norm(t1[i] - t2[i])) < 1e-5

    def test_sym_y_error(self):
        # y-axis rotation of gt should give ~0 sym error but nonzero full error
        R = _rand_rot(4)
        a = 0.7
        yrot = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]], dtype=np.float32
        )
        R2 = np.einsum("bij,jk->bik", R, yrot)
        err_sym = np.asarray(
            geom.rotation_error_deg_sym_y(jnp.asarray(R), jnp.asarray(R2), jnp.ones(4, dtype=bool))
        )
        err_full = np.asarray(
            geom.rotation_error_deg_sym_y(jnp.asarray(R), jnp.asarray(R2), jnp.zeros(4, dtype=bool))
        )
        assert err_sym.max() < 0.1
        assert err_full.min() > 10.0


class TestAxangleChain:
    def test_chain_matches_sequential(self):
        chain = [(1, 0, 0, 0.5), (0, 0, 1, -0.7)]
        out = np.asarray(geom.rot_from_axangle_chain(chain))
        a = np.asarray(geom.axangle_to_mat(jnp.asarray([[1.0, 0, 0]]), jnp.asarray([0.5 * np.pi])))[0]
        b = np.asarray(geom.axangle_to_mat(jnp.asarray([[0.0, 0, 1]]), jnp.asarray([-0.7 * np.pi])))[0]
        np.testing.assert_allclose(out, a @ b, atol=1e-6)

    def test_pose_3x4_to_4x4(self):
        pose = RNG.normal(size=(3, 3, 4)).astype(np.float32)
        out = np.asarray(geom.pose_3x4_to_4x4(jnp.asarray(pose)))
        assert out.shape == (3, 4, 4)
        np.testing.assert_allclose(out[:, :3, :], pose)
        np.testing.assert_allclose(out[:, 3, :], np.tile([0, 0, 0, 1], (3, 1)))
