"""Tests for device-side ball-crop / FPS / random sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.geom import backproject
from catre_tpu.ops.sampling import (
    ball_crop_indices,
    batch_ball_crop,
    farthest_point_indices,
    random_sample_indices,
)

RNG = np.random.default_rng(11)


def test_ball_crop_basic():
    # 200 points inside radius 0.1 of center, 300 outside
    center = np.array([0.1, -0.05, 1.0], dtype=np.float32)
    inside = (RNG.normal(size=(200, 3)) * 0.02 + center).astype(np.float32)
    outside = (RNG.normal(size=(300, 3)) * 0.02 + center + 5.0).astype(np.float32)
    pts = np.concatenate([inside, outside])
    valid = np.ones(500, dtype=bool)

    idx, n_inside = ball_crop_indices(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid),
        jnp.asarray(center), jnp.float32(0.2), num_points=128,
    )
    assert int(n_inside) == 200
    assert np.all(np.asarray(idx) < 200)  # only inside points selected
    assert len(set(np.asarray(idx).tolist())) == 128  # without replacement


def test_ball_crop_duplicates_when_scarce():
    center = np.zeros(3, dtype=np.float32)
    inside = (RNG.normal(size=(20, 3)) * 0.01).astype(np.float32)
    outside = (RNG.normal(size=(100, 3)) * 0.01 + 10).astype(np.float32)
    pts = np.concatenate([inside, outside])
    idx, n_inside = ball_crop_indices(
        jax.random.PRNGKey(1), jnp.asarray(pts), jnp.ones(120, dtype=bool),
        jnp.asarray(center), jnp.float32(0.1), num_points=64,
    )
    assert int(n_inside) == 20
    sel = np.asarray(idx)
    assert np.all(sel < 20)
    assert len(set(sel.tolist())) == 20  # all 20 present, cycled to 64


def test_ball_crop_radius_growth():
    # fewer than 10 points at the initial radius -> radius must grow x1.1
    center = np.zeros(3, dtype=np.float32)
    near = (RNG.normal(size=(5, 3)) * 0.005).astype(np.float32)  # within 0.05
    ring = np.zeros((30, 3), dtype=np.float32)
    ring[:, 0] = 0.058  # inside 0.05 * 1.1^2 = 0.0605, outside 0.055
    pts = np.concatenate([near, ring])
    idx, n_inside = ball_crop_indices(
        jax.random.PRNGKey(2), jnp.asarray(pts), jnp.ones(35, dtype=bool),
        jnp.asarray(center), jnp.float32(0.01), num_points=16,  # clamped to 0.05
    )
    assert int(n_inside) == 35  # growth picked up the ring


def test_ball_crop_invalid_fallback():
    # nothing within any grown radius -> all valid points used
    center = np.zeros(3, dtype=np.float32)
    pts = (RNG.normal(size=(50, 3)) + 100).astype(np.float32)
    valid = np.zeros(50, dtype=bool)
    valid[:30] = True
    idx, n_inside = ball_crop_indices(
        jax.random.PRNGKey(3), jnp.asarray(pts), jnp.asarray(valid),
        jnp.asarray(center), jnp.float32(0.1), num_points=16,
    )
    assert int(n_inside) == 30
    assert np.all(np.asarray(idx) < 30)


def test_batch_ball_crop_from_depth():
    K = np.array([[577.5, 0, 31.5], [0, 577.5, 23.5], [0, 0, 1]], dtype=np.float32)
    depth = np.full((48, 64), 1.0, dtype=np.float32)
    depth[:10, :10] = 0  # invalid region
    cloud = backproject(jnp.asarray(depth), jnp.asarray(K))

    masks = np.zeros((2, 48, 64), dtype=bool)
    masks[0, 20:40, 20:50] = True
    masks[1, 5:15, 5:30] = True  # overlaps invalid depth

    poses = np.tile(np.concatenate([np.eye(3), [[0], [0], [1.0]]], axis=1), (2, 1, 1)).astype(np.float32)
    scales = np.full((2, 3), 0.3, dtype=np.float32)

    pcls, idx, n_inside = batch_ball_crop(
        jax.random.PRNGKey(4), cloud, jnp.asarray(masks), jnp.asarray(poses),
        jnp.asarray(scales), ratio=0.6, num_points=256,
    )
    assert pcls.shape == (2, 256, 3)
    assert int(n_inside[0]) > 0 and int(n_inside[1]) > 0
    # all sampled points have depth 1.0 (mask ∧ depth>0 respected)
    np.testing.assert_allclose(np.asarray(pcls)[..., 2], 1.0, atol=1e-6)


def test_fps_spreads_points():
    # clustered data: FPS must pick from all clusters
    clusters = [RNG.normal(size=(50, 3)) * 0.01 + c for c in ([0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1])]
    pts = np.concatenate(clusters).astype(np.float32)
    idx = farthest_point_indices(jnp.asarray(pts), 4)
    sel = np.asarray(pts)[np.asarray(idx)]
    # pairwise distances all large
    d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
    assert d[~np.eye(4, dtype=bool)].min() > 0.9


def test_random_sample_without_replacement():
    idx = random_sample_indices(jax.random.PRNGKey(5), 100, 50)
    assert len(set(np.asarray(idx).tolist())) == 50
    idx2 = random_sample_indices(jax.random.PRNGKey(6), 100, 50, n_valid=jnp.int32(10))
    sel = np.asarray(idx2)
    assert np.all(sel < 10)
    assert len(set(sel.tolist())) == 10


def test_windowed_ball_crop_equivalence():
    """window_size covering the mask bbox: identical candidate semantics to
    the full-field path (same in-ball point multiset when the ball holds
    fewer than num_points, same n_inside; flat indices map back to image
    pixels)."""
    import jax

    from catre_tpu.ops.sampling import batch_ball_crop

    h, w = 96, 128
    K_depth = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[40:64, 60:90]
    K_depth[ys, xs] = 1.0
    cloud = np.zeros((h, w, 3), np.float32)
    cloud[:, :, 2] = K_depth
    cloud[:, :, 0] = (np.arange(w)[None, :] - 64.0) / 600.0
    cloud[:, :, 1] = (np.arange(h)[:, None] - 48.0) / 600.0
    mask = np.zeros((1, h, w), bool)
    mask[0, 44:60, 64:80] = True  # 256 valid px < num_points
    t = np.array([cloud[52, 72, 0], cloud[52, 72, 1], 1.0], np.float32)
    pose = np.concatenate([np.eye(3, dtype=np.float32), t[:, None]], axis=1)[None]
    scale = np.full((1, 3), 0.3, np.float32)

    out_full = batch_ball_crop(jax.random.PRNGKey(0), jnp.asarray(cloud),
                               jnp.asarray(mask), jnp.asarray(pose),
                               jnp.asarray(scale), ratio=0.6, num_points=512)
    out_win = batch_ball_crop(jax.random.PRNGKey(1), jnp.asarray(cloud),
                              jnp.asarray(mask), jnp.asarray(pose),
                              jnp.asarray(scale), ratio=0.6, num_points=512,
                              window_size=48)
    n_full = int(out_full[2][0])
    n_win = int(out_win[2][0])
    assert n_full == n_win == 256
    # same candidate multiset: the unique flat pixel indices agree
    set_full = set(np.asarray(out_full[1][0]).tolist())
    set_win = set(np.asarray(out_win[1][0]).tolist())
    assert set_full == set_win
    # windowed flat indices decode to in-mask pixels
    rr, cc = np.divmod(np.asarray(out_win[1][0]), w)
    assert mask[0, rr, cc].all()
    # sampled coordinates match the cloud at those pixels
    np.testing.assert_allclose(np.asarray(out_win[0][0]), cloud[rr, cc], atol=0)


def test_ball_crop_from_depth_bit_identical():
    """The fused from-depth windowed path (u16 depth + packed word +
    host-precomputed mask bboxes) is bit-identical to batch_ball_crop over
    the materialized cloud/masks with the same key — including an empty
    instance slot and a mask whose bbox clamps at the image border."""
    from catre_tpu.ops.sampling import batch_ball_crop_from_depth

    h, w, m, ws, npts = 96, 128, 3, 48, 256
    rng = np.random.default_rng(3)
    depth_u16 = np.zeros((h, w), np.uint16)
    masks = np.zeros((m, h, w), bool)
    # instance 0: interior blob; instance 1: hugs the top-left border
    # (window origin clamps); instance 2: left empty
    regions = [(40, 64, 60, 90), (0, 20, 0, 25)]
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (m, 1, 1))
    K = np.array([[600.0, 0, 64.0], [0, 600.0, 48.0], [0, 0, 1]], np.float32)
    for i, (r0, r1, c0, c1) in enumerate(regions):
        depth_u16[r0:r1, c0:c1] = rng.integers(800, 1200, (r1 - r0, c1 - c0))
        masks[i, r0:r1, c0:c1] = rng.random((r1 - r0, c1 - c0)) < 0.8
        rc, cc = (r0 + r1) // 2, (c0 + c1) // 2
        z = depth_u16[rc, cc] / 1000.0
        poses[i, :, 3] = [(cc - K[0, 2]) / K[0, 0] * z,
                          (rc - K[1, 2]) / K[1, 1] * z, max(z, 0.9)]
    scales = np.full((m, 3), 0.25, np.float32)

    # reference path: full-frame cloud + unpacked masks
    cloud = backproject(jnp.asarray(depth_u16.astype(np.float32) / 1000.0),
                        jnp.asarray(K))
    ref = batch_ball_crop(jax.random.PRNGKey(7), cloud, jnp.asarray(masks),
                          jnp.asarray(poses), jnp.asarray(scales),
                          ratio=1.0, num_points=npts, window_size=ws)

    packed = np.zeros((h, w), np.uint8)
    for i in range(m):
        packed |= masks[i].astype(np.uint8) << i
    mask_bbox = np.empty((m, 4), np.int32)
    mask_bbox[:, 0], mask_bbox[:, 1] = h, -1
    mask_bbox[:, 2], mask_bbox[:, 3] = w, -1
    for i in range(m):
        rows, cols = masks[i].any(axis=1), masks[i].any(axis=0)
        if rows.any():
            rnz, cnz = np.flatnonzero(rows), np.flatnonzero(cols)
            mask_bbox[i] = (rnz[0], rnz[-1], cnz[0], cnz[-1])

    for packed_arg in (jnp.asarray(packed), jnp.asarray(masks)):
        fused = batch_ball_crop_from_depth(
            jax.random.PRNGKey(7), jnp.asarray(depth_u16), jnp.asarray(K),
            packed_arg, jnp.asarray(mask_bbox), jnp.asarray(poses),
            jnp.asarray(scales), ratio=1.0, num_points=npts, window_size=ws)
        for a, b in zip(ref, fused):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # f32-meter depth input is accepted too
    fused32 = batch_ball_crop_from_depth(
        jax.random.PRNGKey(7), jnp.asarray(depth_u16.astype(np.float32) / 1000.0),
        jnp.asarray(K), jnp.asarray(packed), jnp.asarray(mask_bbox),
        jnp.asarray(poses), jnp.asarray(scales),
        ratio=1.0, num_points=npts, window_size=ws)
    for a, b in zip(ref, fused32):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_between_image_dims():
    """window_size between the two image dims (h < ws < w): both windowed
    paths clamp the slice per-dimension instead of overrunning the smaller
    dim, and still agree with each other and the full-field candidate set."""
    from catre_tpu.ops.sampling import batch_ball_crop_from_depth

    h, w, npts = 40, 100, 1024
    depth_u16 = np.zeros((h, w), np.uint16)
    depth_u16[8:36, 30:70] = 1000
    masks = np.zeros((1, h, w), bool)
    masks[0, 10:34, 35:65] = True
    K = np.array([[500.0, 0, 50.0], [0, 500.0, 20.0], [0, 0, 1]], np.float32)
    pose = np.tile(np.eye(3, 4, dtype=np.float32), (1, 1, 1))
    pose[0, :, 3] = [0.0, 0.0, 1.0]
    scale = np.full((1, 3), 0.3, np.float32)

    cloud = backproject(jnp.asarray(depth_u16.astype(np.float32) / 1000.0),
                        jnp.asarray(K))
    full = batch_ball_crop(jax.random.PRNGKey(3), cloud, jnp.asarray(masks),
                           jnp.asarray(pose), jnp.asarray(scale),
                           ratio=3.0, num_points=npts)
    win = batch_ball_crop(jax.random.PRNGKey(3), cloud, jnp.asarray(masks),
                          jnp.asarray(pose), jnp.asarray(scale),
                          ratio=3.0, num_points=npts, window_size=64)
    mask_bbox = np.array([[10, 33, 35, 64]], np.int32)
    fused = batch_ball_crop_from_depth(
        jax.random.PRNGKey(3), jnp.asarray(depth_u16), jnp.asarray(K),
        jnp.asarray(masks), jnp.asarray(mask_bbox), jnp.asarray(pose),
        jnp.asarray(scale), ratio=3.0, num_points=npts, window_size=64)
    # fused == windowed bit-exactly; both match the full-field candidate set
    for a, b in zip(win, fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    n = int(full[2][0])
    assert n == int(win[2][0]) == 24 * 30
    assert (set(np.asarray(full[1][0]).tolist())
            == set(np.asarray(win[1][0]).tolist()))


def test_packed_sort_selection_semantics():
    """selection='packed_sort' (one u32 sort instead of f32 top_k):
    identical n_inside, same every-inside-point multiset when
    n_inside <= num_points, and a duplicate-free uniform subset of the
    inside points when n_inside > num_points."""
    center = np.array([0.0, 0.0, 1.0], np.float32)
    rng = np.random.default_rng(5)
    inside = (rng.normal(size=(300, 3)) * 0.02 + center).astype(np.float32)
    outside = (rng.normal(size=(200, 3)) * 0.02 + center + 5.0).astype(np.float32)
    pts = np.concatenate([inside, outside])
    valid = np.ones(500, bool)

    for npts, expect_all in ((400, True), (128, False)):
        i_top, n_top = ball_crop_indices(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(center), jnp.float32(0.2), num_points=npts)
        i_ps, n_ps = ball_crop_indices(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(center), jnp.float32(0.2), num_points=npts,
            selection="packed_sort")
        assert int(n_top) == int(n_ps) == 300
        a, b = np.asarray(i_top), np.asarray(i_ps)
        assert np.all(b < 300)  # only inside points selected
        if expect_all:
            # every inside point taken (cycled) in both schemes
            assert set(a.tolist()) == set(b.tolist()) == set(range(300))
        else:
            # without-replacement subset of the inside points
            assert len(set(b.tolist())) == npts

    # empty-ball fallback path unchanged
    i_e, n_e = ball_crop_indices(
        jax.random.PRNGKey(2), jnp.asarray(pts), jnp.asarray(~valid),
        jnp.asarray(center), jnp.float32(0.2), num_points=64,
        selection="packed_sort")
    assert int(n_e) == 0


def test_presampled_bit_identical():
    """Splitting the fused windowed crop into its deterministic half
    (batch_ball_crop_candidates) + randomized half
    (batch_select_from_candidates) is bit-identical to
    batch_ball_crop_from_depth with the same key — the contract the
    frozen-eval presampled path relies on. Covers an empty instance, a
    border-clamped window, u8-packed and unpacked masks, and both
    selection schemes."""
    from catre_tpu.ops.sampling import (batch_ball_crop_candidates,
                                        batch_ball_crop_from_depth,
                                        batch_select_from_candidates)

    h, w, m, ws, npts = 96, 128, 3, 48, 256
    rng = np.random.default_rng(11)
    depth_u16 = np.zeros((h, w), np.uint16)
    masks = np.zeros((m, h, w), bool)
    regions = [(40, 64, 60, 90), (0, 20, 0, 25)]  # interior + border clamp
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (m, 1, 1))
    K = np.array([[600.0, 0, 64.0], [0, 600.0, 48.0], [0, 0, 1]], np.float32)
    for i, (r0, r1, c0, c1) in enumerate(regions):
        depth_u16[r0:r1, c0:c1] = rng.integers(800, 1200, (r1 - r0, c1 - c0))
        masks[i, r0:r1, c0:c1] = rng.random((r1 - r0, c1 - c0)) < 0.8
        rc, cc = (r0 + r1) // 2, (c0 + c1) // 2
        z = depth_u16[rc, cc] / 1000.0
        poses[i, :, 3] = [(cc - K[0, 2]) / K[0, 0] * z,
                          (rc - K[1, 2]) / K[1, 1] * z, max(z, 0.9)]
    scales = np.full((m, 3), 0.25, np.float32)
    packed = np.zeros((h, w), np.uint8)
    for i in range(m):
        packed |= masks[i].astype(np.uint8) << i
    mask_bbox = np.empty((m, 4), np.int32)
    mask_bbox[:, 0], mask_bbox[:, 1] = h, -1
    mask_bbox[:, 2], mask_bbox[:, 3] = w, -1
    for i in range(m):
        rows, cols = masks[i].any(axis=1), masks[i].any(axis=0)
        if rows.any():
            rnz, cnz = np.flatnonzero(rows), np.flatnonzero(cols)
            mask_bbox[i] = (rnz[0], rnz[-1], cnz[0], cnz[-1])

    for packed_arg in (jnp.asarray(packed), jnp.asarray(masks)):
        for selection in ("topk", "packed_sort"):
            fused = batch_ball_crop_from_depth(
                jax.random.PRNGKey(7), jnp.asarray(depth_u16), jnp.asarray(K),
                packed_arg, jnp.asarray(mask_bbox), jnp.asarray(poses),
                jnp.asarray(scales), ratio=1.0, num_points=npts,
                window_size=ws, selection=selection)
            pts_c, inside, n_in, origin = batch_ball_crop_candidates(
                jnp.asarray(depth_u16), jnp.asarray(K), packed_arg,
                jnp.asarray(mask_bbox), jnp.asarray(poses),
                jnp.asarray(scales), ratio=1.0, window_size=ws)
            np.testing.assert_array_equal(np.asarray(n_in),
                                          np.asarray(fused[2]))
            pre = batch_select_from_candidates(
                jax.random.PRNGKey(7), pts_c, inside, n_in, origin,
                num_points=npts, img_w=w, wsw=ws, selection=selection)
            for a, b in zip(fused, pre):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

