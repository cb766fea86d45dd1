"""FPS sampling option of the ball-crop (INPUT.FPS_SAMPLE ablation)."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.geom import backproject
from catre_tpu.ops.sampling import batch_ball_crop, farthest_point_indices

RNG = np.random.default_rng(21)


def test_masked_fps_never_selects_invalid():
    pts = RNG.normal(size=(100, 3)).astype(np.float32)
    valid = np.zeros(100, dtype=bool)
    valid[:37] = True
    idx = farthest_point_indices(jnp.asarray(pts), 16, valid=jnp.asarray(valid))
    assert np.all(np.asarray(idx) < 37)
    assert len(set(np.asarray(idx).tolist())) == 16


def test_batch_ball_crop_fps_mode():
    K = np.array([[577.5, 0, 31.5], [0, 577.5, 23.5], [0, 0, 1]], dtype=np.float32)
    depth = np.full((48, 64), 1.0, dtype=np.float32)
    cloud = backproject(jnp.asarray(depth), jnp.asarray(K))
    masks = np.zeros((1, 48, 64), dtype=bool)
    masks[0, 10:40, 10:60] = True
    poses = np.tile(np.concatenate([np.eye(3), [[0], [0], [1.0]]], axis=1), (1, 1, 1)).astype(np.float32)
    scales = np.full((1, 3), 0.3, dtype=np.float32)

    pcls, idx, n_inside = batch_ball_crop(
        jax.random.PRNGKey(0), cloud, jnp.asarray(masks), jnp.asarray(poses),
        jnp.asarray(scales), ratio=0.6, num_points=64, fps_sample=True,
    )
    p = np.asarray(pcls)[0]
    assert p.shape == (64, 3)
    np.testing.assert_allclose(p[:, 2], 1.0, atol=1e-6)
    # FPS spreads: mean nearest-neighbor distance larger than random sampling
    pr, _, _ = batch_ball_crop(
        jax.random.PRNGKey(0), cloud, jnp.asarray(masks), jnp.asarray(poses),
        jnp.asarray(scales), ratio=0.6, num_points=64, fps_sample=False,
    )
    def mean_nn(x):
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min(axis=1).mean()
    assert mean_nn(p) > mean_nn(np.asarray(pr)[0])
