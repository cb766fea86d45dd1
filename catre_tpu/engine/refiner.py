"""Jitted iterative refinement (inference path).

TPU-native replacement for the reference's python refine loop
(`core/catre/engine/catre_evaluator.py:295-311` + `batch_test.py:66-99`):
the whole N-iteration refinement is ONE `jax.lax.scan` inside one jit —
keypoint transform, zero-centering, encoder, heads and composition fuse into
a single XLA program; per-iteration poses/scales are stacked scan outputs so
the evaluator can score iter 0..N like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.catre import CATREConfig, CATREDisRShared, refine_forward


def make_refine_fn(model: CATREDisRShared, cfg: CATREConfig, n_iter: int):
    """Build a jitted refine(params, pcl, obj_kps, init_pose, init_scale, K,
    mean_scales) -> (poses (n_iter+1, B, 3, 4), scales (n_iter+1, B, 3)).

    Index 0 holds the initial estimates (the reference scores iter0 too,
    `catre_custom_evaluator.py:211-213`).
    """

    @partial(jax.jit, donate_argnums=())
    def refine(params, pcl, obj_kps, init_pose, init_scale, K, mean_scales):
        def body(carry, _):
            pose, scale = carry
            new_pose, new_scale = refine_forward(
                model, params, cfg, pcl, obj_kps, pose, scale, K, mean_scales
            )
            return (new_pose, new_scale), (new_pose, new_scale)

        (_, _), (poses, scales) = jax.lax.scan(
            body, (init_pose, init_scale), None, length=n_iter
        )
        poses = jnp.concatenate([init_pose[None], poses], axis=0)
        scales = jnp.concatenate([init_scale[None], scales], axis=0)
        return poses, scales

    return refine
