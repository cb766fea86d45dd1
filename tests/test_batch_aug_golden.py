"""Golden tests: batch-level 3D augmentation math vs the ACTUAL reference
`core/catre/engine/engine_utils.{aug_3d_bbox,aug_RT}`. The reference draws
its per-batch parameters internally via torch.rand — the tests monkeypatch
torch.rand to prescribed values and drive our transforms with the same
parameters (via the ratios_e / rxyz_deg / dt_override injection args), so
the pinned contract is the exact transform math."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

# Load ONLY the three functions under test from the reference source (its
# module-level import chain drags mmcv/transforms3d/numba/png, not in this
# image). ast-extracting the defs keeps this a live read of the reference
# checkout, same as importing it.
import ast  # noqa: E402
import math  # noqa: E402
import types  # noqa: E402

_SRC = "/root/reference/core/catre/engine/engine_utils.py"
_tree = ast.parse(open(_SRC).read())
_wanted = {"aug_3d_bbox", "aug_RT", "get_rotation_torch"}
_mod = ast.Module(
    body=[n for n in _tree.body
          if isinstance(n, ast.FunctionDef) and n.name in _wanted],
    type_ignores=[])
assert len(_mod.body) == 3
REF = types.SimpleNamespace(torch=torch, np=np, math=math)
_ns = {"torch": torch, "np": np, "math": math}
exec(compile(_mod, _SRC, "exec"), _ns)
REF.aug_3d_bbox = _ns["aug_3d_bbox"]
REF.aug_RT = _ns["aug_RT"]

from catre_tpu.data.aug import aug_3d_bbox, aug_rt  # noqa: E402

RNG = np.random.default_rng(7)


def _batch(bs=3, pts=40, sym=(False, True, False)):
    pcl = RNG.normal(size=(bs, pts, 3)).astype(np.float32) * 0.1
    pcl[..., 2] += 1.0
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (bs, 1, 1))
    for i in range(bs):
        a = 0.3 * (i + 1)
        poses[i, :3, :3] = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
            np.float32)
        poses[i, :, 3] = [0.05 * i, -0.02 * i, 1.0 + 0.1 * i]
    scales = (RNG.uniform(0.1, 0.3, (bs, 3))).astype(np.float32)
    return pcl, poses, scales, np.asarray(sym)


def _patch_rand(monkeypatch, draws):
    it = iter(draws)

    def fake_rand(*shape, **kw):
        return torch.tensor(next(it), dtype=torch.float32).reshape(shape)

    monkeypatch.setattr(torch, "rand", fake_rand)


def test_aug_3d_bbox_matches_reference(monkeypatch):
    pcl, poses, scales, sym = _batch()
    # ex, ey, ez raw U(0,1) draws -> reference maps into [0.8, 1.2]
    _patch_rand(monkeypatch, [[0.25, 0.9, 0.5]])
    batch = {
        "pcl": [torch.from_numpy(p) for p in pcl],
        "obj_pose": [torch.from_numpy(p) for p in poses],
        "obj_scale": [torch.from_numpy(s) for s in scales],
        "sym_info": [np.zeros((4, 3, 3)) if s else None for s in sym],
    }
    REF.aug_3d_bbox(batch, device="cpu")
    ratios_e = np.array([0.25, 0.9, 0.5]) * 0.4 + 0.8
    ours_pcl, ours_scale = aug_3d_bbox(
        jax.random.PRNGKey(0), jnp.asarray(pcl), jnp.asarray(poses),
        jnp.asarray(scales), jnp.asarray(sym), ratios_e=ratios_e)
    np.testing.assert_allclose(np.asarray(ours_pcl),
                               batch["pcl"].numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours_scale),
                               batch["obj_scale"].numpy(), atol=2e-6)


def test_aug_rt_matches_reference(monkeypatch):
    pcl, poses, _, _ = _batch()
    # reference: rx,ry,rz = rand(3)*30-15 ; tx/ty/tz = rand(1)*2s - s
    _patch_rand(monkeypatch, [[0.1, 0.7, 0.4], [0.9], [0.2], [0.6]])
    batch = {
        "pcl": [torch.from_numpy(p) for p in pcl],
        "obj_pose": [torch.from_numpy(p) for p in poses],
    }
    REF.aug_RT(batch, device="cpu")
    rxyz = np.array([0.1, 0.7, 0.4]) * 30.0 - 15.0
    dt = np.array([0.9 * 0.01 - 0.005, 0.2 * 0.01 - 0.005,
                   0.6 * 0.05 - 0.025])
    ours_pcl, ours_pose = aug_rt(
        jax.random.PRNGKey(0), jnp.asarray(pcl), jnp.asarray(poses),
        rxyz_deg=rxyz, dt_override=dt)
    np.testing.assert_allclose(np.asarray(ours_pcl),
                               batch["pcl"].numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours_pose),
                               batch["obj_pose"].numpy(), atol=2e-6)


# ---- pose/scale noise transforms (core/utils/pose_aug.py) ----

_POSE_AUG_SRC = "/root/reference/core/utils/pose_aug.py"
_pa_tree = ast.parse(open(_POSE_AUG_SRC).read())
_pa_wanted = {"aug_poses_normal", "aug_scale_normal"}
_pa_mod = ast.Module(
    body=[n for n in _pa_tree.body
          if isinstance(n, ast.FunctionDef) and n.name in _pa_wanted],
    type_ignores=[])
assert len(_pa_mod.body) == 2
_pu_tree = ast.parse(
    open("/root/reference/core/utils/pose_utils.py").read())
_pa_mod.body += [n for n in _pu_tree.body
                 if isinstance(n, ast.FunctionDef) and n.name == "euler2mat_torch"]
assert len(_pa_mod.body) == 3


class _FakeMMCV:
    @staticmethod
    def is_seq_of(seq, t):
        return isinstance(seq, (list, tuple)) and all(
            isinstance(x, t if isinstance(t, tuple) else (t,)) for x in seq)


from collections.abc import Sequence as _Seq  # noqa: E402

_pa_ns = {"torch": torch, "np": np, "math": math, "mmcv": _FakeMMCV,
          "Sequence": _Seq}
exec(compile(_pa_mod, _POSE_AUG_SRC, "exec"), _pa_ns)
REF.aug_poses_normal = _pa_ns["aug_poses_normal"]
REF.aug_scale_normal = _pa_ns["aug_scale_normal"]

from catre_tpu.data.aug import aug_poses_normal, aug_scale_normal  # noqa: E402


def test_aug_poses_normal_matches_reference(monkeypatch):
    """Same drawn noises -> identical pose perturbation: euler clamp to
    ±max_rot BEFORE the matrix, R_aug = noise @ R, z clamped to min_z, and
    the euler convention (xmat @ ymat @ zmat, euler2mat_torch)."""
    _, poses, _, _ = _batch()
    poses[0, 2, 3] = 0.05  # z-clamp case (min_z=0.1)
    euler_deg = np.array([[50.0, -3.0, 12.0],   # x clamps to 45
                          [5.0, 9.0, -50.0],    # z clamps to -45
                          [-2.0, 1.0, 4.0]], np.float32)
    trans_noise = np.array([[0.01, -0.02, -0.08],
                            [0.0, 0.0, 0.0],
                            [-0.03, 0.04, 0.02]], np.float32)
    calls = iter([torch.from_numpy(euler_deg), torch.from_numpy(trans_noise)])
    monkeypatch.setattr(torch, "normal", lambda *a, **k: next(calls))
    ref = REF.aug_poses_normal(torch.from_numpy(poses), std_rot=15,
                               std_trans=[0.01, 0.01, 0.05])
    ours = aug_poses_normal(jax.random.PRNGKey(0), jnp.asarray(poses),
                            jnp.asarray([15.0]),
                            jnp.asarray([[0.01, 0.01, 0.05]]),
                            euler_deg_override=euler_deg,
                            trans_noise_override=trans_noise)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=3e-6)


def test_aug_scale_normal_matches_reference(monkeypatch):
    scales = np.array([[0.1, 0.2, 0.3], [0.05, 0.44, 0.02]], np.float32)
    noise = np.array([[0.2, -0.3, 0.0], [-0.2, 0.1, 0.0]], np.float32)
    monkeypatch.setattr(torch, "normal",
                        lambda *a, **k: torch.from_numpy(noise))
    ref = REF.aug_scale_normal(torch.from_numpy(scales),
                               std_scale=[0.11, 0.04, 0.9])
    ours = aug_scale_normal(jax.random.PRNGKey(0), jnp.asarray(scales),
                            jnp.asarray([[0.11, 0.04, 0.9]]),
                            noise_override=noise)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-7)
