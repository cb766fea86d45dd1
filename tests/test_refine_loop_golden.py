"""Composed refine-LOOP golden vs the ACTUAL reference.

`tests/test_model_golden.py` pins ONE forward to 2e-4; this test pins the
full 4-iteration inference loop — the reference's test-time glue
(`core/catre/engine/batch_test.py:66-99` batch_updater_test: mean-shape kps
transformed by the current estimate, zero-centered pcl) + the real model
forward (`CATRE_disR_shared.forward:66-88`) + `rot6d_to_mat_batch`
(`core/utils/rot_reps.py:34-56`) + `pose_scale_from_delta_init`
(`core/catre/models/pose_scale_from_delta_init.py`) iterated with feedback —
against `engine/refiner.py`'s single-scan jitted loop with the SAME weights
(through `torch_state_dict_to_params`) and SAME inputs. This bounds error
COMPOUNDING across iterations, the strongest released-checkpoint de-risk
available without the asset (iterated composition amplifies any layout or
composition bug exponentially, so a tight iter-4 bound is a strong parity
signal)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from catre_tpu.engine.refiner import make_refine_fn  # noqa: E402
from catre_tpu.models import CATREConfig, CATREDisRShared  # noqa: E402
from catre_tpu.utils.checkpoint import torch_state_dict_to_params  # noqa: E402

from test_compose_golden import REF as COMPOSE_REF  # noqa: E402  (ast-extracted actual reference fn)
from test_model_golden import _build_reference_model, _reference_forward  # noqa: E402

RNG = np.random.default_rng(47)
N_ITER = 4


def _rot6d_to_mat(d6):
    """ACTUAL reference math, `core/utils/rot_reps.py:34-56` (8 lines of
    linear algebra, transcribed rather than ast-extracted because the module
    imports transforms3d at top level, absent here)."""
    x = F.normalize(d6[..., 0:3], p=2, dim=-1)
    z = F.normalize(torch.cross(x, d6[..., 3:6], dim=-1), p=2, dim=-1)
    y = torch.cross(z, x, dim=-1)
    return torch.stack((x, y, z), dim=-1)


def _reference_refine_loop(ref, pcl, mean_points, init_pose, init_scale, K):
    """The reference test loop: batch_updater_test glue + forward +
    composition, iterated N_ITER times with feedback (batch_test.py:66-99,
    CATRE_disR_shared.py:66-121, shipped flagship config: mean_shape kps,
    ZERO_CENTER_INPUT=True, ego_rot6d, iter_add, image/cosypose/K-aware,
    REFINE_SCLAE=True)."""
    poses = [init_pose]
    scales = [init_scale]
    pose, scale = init_pose, init_scale
    for _ in range(N_ITER):
        r_est = pose[:, :3, :3]
        t_est = pose[:, :3, 3]
        # transform_normed_pts_batch(kps, R, t=None, scale) — zero-centered
        tfd_kps = (r_est.unsqueeze(1) @ (mean_points * scale.unsqueeze(1)).unsqueeze(-1)).squeeze(-1)
        x = pcl - t_est.unsqueeze(1)
        with torch.no_grad():
            rot6, trans_d, scale_d = _reference_forward(
                ref, x.permute(0, 2, 1), tfd_kps.permute(0, 2, 1), scale)
        rot_m = _rot6d_to_mat(rot6)
        R, t, s = COMPOSE_REF.fn(
            rot_m, trans_d, scale_d, r_est, t_est, scale, Ks=K,
            K_aware=True, delta_T_space="image", delta_T_weight=1.0,
            delta_z_style="cosypose", eps=1e-4, is_allo=False,
            scale_type="iter_add")
        pose = torch.cat([R, t.unsqueeze(-1)], dim=-1)
        scale = s
        poses.append(pose)
        scales.append(scale)
    return torch.stack(poses), torch.stack(scales)


def test_refine_loop_matches_reference_composition():
    ref = _build_reference_model()
    for m in (ref.pcl_net, ref.rot_head, ref.ts_head):
        m.eval()
    sd = {}
    for prefix, mod in (("pcl_net", ref.pcl_net), ("rot_head", ref.rot_head),
                        ("ts_head", ref.ts_head)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    params = torch_state_dict_to_params(sd)

    B = 3
    t0 = np.array([0.05, -0.05, 1.0], np.float32)
    pcl = (RNG.normal(size=(B, 1024, 3)) * 0.12 + t0).astype(np.float32)
    mean_points = (RNG.normal(size=(B, 1024, 3)) * 0.3).astype(np.float32)
    R0 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    init_pose = np.concatenate([R0, np.tile(t0[:, None], (B, 1, 1))], axis=2)
    init_scale = RNG.uniform(0.1, 0.35, size=(B, 3)).astype(np.float32)
    K = np.tile(np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084],
                          [0, 0, 1]], np.float32), (B, 1, 1))
    mean_scales = RNG.uniform(0.1, 0.35, size=(B, 3)).astype(np.float32)

    ref_poses, ref_scales = _reference_refine_loop(
        ref, torch.from_numpy(pcl), torch.from_numpy(mean_points),
        torch.from_numpy(init_pose), torch.from_numpy(init_scale),
        torch.from_numpy(K))

    cfg = CATREConfig()
    model = CATREDisRShared(cfg)
    refine = make_refine_fn(model, cfg, n_iter=N_ITER)
    poses, scales = refine(params, jnp.asarray(pcl), jnp.asarray(mean_points),
                           jnp.asarray(init_pose), jnp.asarray(init_scale),
                           jnp.asarray(K), jnp.asarray(mean_scales))

    # iteration-by-iteration bound: compounding through 4 feedback passes
    # must stay near the single-forward tolerance (2e-4), not blow up
    for i in range(N_ITER + 1):
        np.testing.assert_allclose(
            np.asarray(poses[i]), ref_poses[i].numpy(), atol=5e-4,
            err_msg=f"pose diverged at refine iter {i}")
        np.testing.assert_allclose(
            np.asarray(scales[i]), ref_scales[i].numpy(), atol=5e-4,
            err_msg=f"scale diverged at refine iter {i}")
