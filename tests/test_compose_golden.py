"""Golden test: pose/scale delta composition vs the ACTUAL reference
`core/catre/models/pose_scale_from_delta_init.py` + `core/utils/utils.py::
allo_to_ego_mat_torch` + `pose_utils.quat2mat_torch`, across the full mode
grid (delta_T_space x K_aware x delta_z_style x scale_type x is_allo).
Functions are ast-extracted from the reference checkout (its import chains
need mmcv/transforms3d/detectron2, absent here); `cat` is detectron2's
torch.cat alias."""

import ast
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from catre_tpu.models.compose import pose_scale_from_delta_init  # noqa: E402


def _extract(path, names, ns):
    tree = ast.parse(open(path).read())
    mod = ast.Module(body=[n for n in tree.body
                           if isinstance(n, ast.FunctionDef) and n.name in names],
                     type_ignores=[])
    assert len(mod.body) == len(names)
    exec(compile(mod, path, "exec"), ns)
    return ns


_ns = {"torch": torch, "np": np, "cat": torch.cat}
_extract("/root/reference/core/utils/pose_utils.py", {"quat2mat_torch"}, _ns)
_extract("/root/reference/core/utils/utils.py", {"allo_to_ego_mat_torch"}, _ns)
_extract("/root/reference/core/catre/models/pose_scale_from_delta_init.py",
         {"pose_scale_from_delta_init"}, _ns)
REF = types.SimpleNamespace(fn=_ns["pose_scale_from_delta_init"])

RNG = np.random.default_rng(13)


_st = pytest.importorskip("scipy.spatial.transform")


def _rand_rot(b):
    return _st.Rotation.random(b, random_state=3).as_matrix().astype(np.float32)


@pytest.mark.parametrize("space,k_aware,z_style", [
    ("image", True, "cosypose"), ("image", False, "cosypose"),
    ("image", True, "deepim"), ("3D", False, "cosypose")])
@pytest.mark.parametrize("scale_type", ["iter_add", "mean_exp"])
@pytest.mark.parametrize("is_allo", [False, True])
def test_compose_matches_reference(space, k_aware, z_style, scale_type,
                                   is_allo):
    b = 5
    rot_d, rot_i = _rand_rot(b), _rand_rot(b)
    trans_d = RNG.normal(size=(b, 3)).astype(np.float32) * 0.1 + \
        np.array([0, 0, 1.0], np.float32)
    trans_i = RNG.normal(size=(b, 3)).astype(np.float32) * 0.05 + \
        np.array([0.1, -0.1, 1.2], np.float32)
    scale_d = (RNG.normal(size=(b, 3)) * 0.1).astype(np.float32)
    scale_i = RNG.uniform(0.1, 0.3, (b, 3)).astype(np.float32)
    Ks = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]],
                          np.float32), (b, 1, 1))

    ref_R, ref_t, ref_s = REF.fn(
        torch.from_numpy(rot_d), torch.from_numpy(trans_d),
        torch.from_numpy(scale_d), torch.from_numpy(rot_i),
        torch.from_numpy(trans_i), torch.from_numpy(scale_i),
        Ks=torch.from_numpy(Ks), K_aware=k_aware, delta_T_space=space,
        delta_z_style=z_style, is_allo=is_allo, scale_type=scale_type)
    our_R, our_t, our_s = pose_scale_from_delta_init(
        jnp.asarray(rot_d), jnp.asarray(trans_d), jnp.asarray(scale_d),
        jnp.asarray(rot_i), jnp.asarray(trans_i), jnp.asarray(scale_i),
        Ks=jnp.asarray(Ks), K_aware=k_aware, delta_T_space=space,
        delta_z_style=z_style, is_allo=is_allo, scale_type=scale_type)
    np.testing.assert_allclose(np.asarray(our_R), ref_R.numpy(), atol=3e-6)
    np.testing.assert_allclose(np.asarray(our_t), ref_t.numpy(), atol=3e-6)
    np.testing.assert_allclose(np.asarray(our_s), ref_s.numpy(), atol=3e-6)
