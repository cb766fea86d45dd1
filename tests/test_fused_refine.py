"""Fused-heads inference path must match the flax path end-to-end."""

import dataclasses

import numpy as np

import jax

from catre_tpu.engine.refiner import make_refine_fn
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

from test_engine import _synthetic_batch


def test_fused_refine_matches_flax():
    cfg = CATREConfig(num_pcl=128, num_kps=128)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    batch = _synthetic_batch(b=4, p=128, k=128)

    refine = make_refine_fn(model, cfg, n_iter=2)
    poses_ref, scales_ref = refine(
        params, batch["pcl"], batch["obj_kps"], batch["obj_pose"],
        batch["obj_scale"], batch["K"], batch["obj_mean_scales"],
    )

    cfg_fused = dataclasses.replace(cfg, fused_heads=True)
    model_fused = CATREDisRShared(cfg_fused)
    refine_fused = make_refine_fn(model_fused, cfg_fused, n_iter=2)
    poses_f, scales_f = refine_fused(
        params, batch["pcl"], batch["obj_kps"], batch["obj_pose"],
        batch["obj_scale"], batch["K"], batch["obj_mean_scales"],
    )
    np.testing.assert_allclose(np.asarray(poses_f), np.asarray(poses_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(scales_f), np.asarray(scales_ref), atol=5e-4)
