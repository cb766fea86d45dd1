"""Golden tests: ball-crop candidate semantics vs the ACTUAL reference
`core/utils/cat_data_utils.crop_ball_from_pts` (radius clamp + x1.1 growth
loop + scarce-candidate behavior + empty-ball fallback). Selection among
candidates is RNG on both sides, so the pinned contract is the CANDIDATE
SET each scheme samples from (compared exactly whenever it fits in
num_points) and subset-membership otherwise."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from core.utils.cat_data_utils import crop_ball_from_pts  # noqa: E402

from catre_tpu.ops.sampling import ball_crop_indices  # noqa: E402


def _ours(pts, center, radius, num_points):
    idx, n_in = ball_crop_indices(
        jax.random.PRNGKey(0), jnp.asarray(pts),
        jnp.ones(len(pts), dtype=bool), jnp.asarray(center),
        jnp.float32(radius), num_points=num_points)
    return set(np.asarray(idx).tolist()), int(n_in)


def _ref(pts, center, radius, num_points):
    torch.manual_seed(0)
    idx = crop_ball_from_pts(torch.from_numpy(pts), torch.from_numpy(center),
                             float(radius), num_points=num_points)
    return set(idx.numpy().tolist())


def test_growth_candidate_set_matches():
    """Initial ball holds < 10 points; the x1.1 growth stops at the first
    radius with >= 10 — both schemes then sample the same candidate set."""
    rng = np.random.default_rng(0)
    center = np.zeros(3, np.float32)
    near = (rng.normal(size=(5, 3)) * 0.012).astype(np.float32)  # within 0.05
    ring = np.zeros((12, 3), np.float32)
    ring[:, 0] = 0.0585  # needs two growths: 0.05*1.1^2 = 0.0605
    far = (rng.normal(size=(40, 3)) * 0.01 + 3.0).astype(np.float32)
    pts = np.concatenate([near, ring, far])
    ours, n_in = _ours(pts, center, 0.01, 32)  # radius clamps to 0.05
    ref = _ref(pts, center, 0.01, 32)
    assert n_in == 17
    assert ours == ref == set(range(17))


def test_scarce_nonzero_keeps_largest_ball_only():
    """No grown radius ever reaches 10 points but the largest ball is
    non-empty: the reference keeps exactly those few candidates
    (`crop_ball_from_pts:292-298` — the <=1e9 fallback fires only for an
    EMPTY ball), NOT every valid point."""
    center = np.zeros(3, np.float32)
    pts = np.zeros((34, 3), np.float32)
    pts[:4, 0] = 0.05   # in-ball at every radius
    pts[4:, 0] = 1.0    # valid but far outside 0.1 * 1.1^9 = 0.236
    ours, n_in = _ours(pts, center, 0.1, 16)
    ref = _ref(pts, center, 0.1, 16)
    assert n_in == 4
    assert ours == ref == {0, 1, 2, 3}


def test_empty_ball_falls_back_to_all_valid():
    center = np.zeros(3, np.float32)
    rng = np.random.default_rng(1)
    pts = (rng.normal(size=(30, 3)) * 0.01 + 5.0).astype(np.float32)
    ours, n_in = _ours(pts, center, 0.1, 30)
    ref = _ref(pts, center, 0.1, 30)
    assert n_in == 30
    assert ours == ref == set(range(30))


def test_dense_selection_is_within_ball():
    rng = np.random.default_rng(2)
    center = np.array([0.1, -0.05, 1.0], np.float32)
    inside = (rng.normal(size=(200, 3)) * 0.02 + center).astype(np.float32)
    outside = (rng.normal(size=(300, 3)) * 0.02 + center + 5.0).astype(np.float32)
    pts = np.concatenate([inside, outside])
    ours, n_in = _ours(pts, center, 0.2, 128)
    ref = _ref(pts, center, 0.2, 128)
    assert n_in == 200
    assert len(ours) == len(ref) == 128
    assert max(ours) < 200 and max(ref) < 200
