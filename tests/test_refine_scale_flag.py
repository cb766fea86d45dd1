"""MODEL.REFINE_SCLAE=False: the scale estimate stays fixed through all
refine iterations (reference ablation, `CATRE_disR_shared.py:118-121`,
`batch_test.py:66-99`)."""

import dataclasses

import numpy as np

import jax

from catre_tpu.engine.refiner import make_refine_fn
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

from test_engine import SMALL_CFG, _synthetic_batch


def test_refine_scale_false_keeps_init_scale():
    cfg = dataclasses.replace(SMALL_CFG, refine_scale=False)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    batch = _synthetic_batch()
    refine = make_refine_fn(model, cfg, n_iter=3)
    poses, scales = refine(
        params, batch["pcl"], batch["obj_kps"], batch["obj_pose"],
        batch["obj_scale"], batch["K"], batch["obj_mean_scales"],
    )
    for i in range(4):
        np.testing.assert_allclose(np.asarray(scales[i]), np.asarray(batch["obj_scale"]))
    # poses still refine (they are allowed to move)
    assert not np.allclose(np.asarray(poses[3]), np.asarray(poses[0]))
