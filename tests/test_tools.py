"""Tests for the offline preprocessing tools (Umeyama/PnP alignment, init
results conversion, label generation)."""

import json
import pickle

import numpy as np
import pytest

from catre_tpu.tools.alignment import pnp_pose, ransac_umeyama, umeyama_similarity

RNG = np.random.default_rng(13)


def _rand_rot():
    a = RNG.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_umeyama_exact_recovery():
    src = RNG.normal(size=(100, 3))
    R = _rand_rot()
    s_gt, t_gt = 1.7, np.array([0.3, -0.2, 1.1])
    tgt = s_gt * src @ R.T + t_gt
    s, R_est, t_est, T = umeyama_similarity(src, tgt)
    assert s == pytest.approx(s_gt, rel=1e-6)
    np.testing.assert_allclose(R_est, R, atol=1e-8)
    np.testing.assert_allclose(t_est, t_gt, atol=1e-8)


def test_ransac_umeyama_with_outliers():
    src = RNG.normal(size=(200, 3))
    R = _rand_rot()
    s_gt, t_gt = 0.8, np.array([0.1, 0.2, 0.9])
    tgt = s_gt * src @ R.T + t_gt
    # corrupt 25% of correspondences
    n_out = 50
    tgt[:n_out] += RNG.normal(size=(n_out, 3)) * 2.0
    s, R_est, t_est, _ = ransac_umeyama(src, tgt, seed=1)
    assert s == pytest.approx(s_gt, rel=1e-3)
    np.testing.assert_allclose(R_est, R, atol=1e-3)
    np.testing.assert_allclose(t_est, t_gt, atol=1e-3)


def test_pnp_recovery():
    cv2 = pytest.importorskip("cv2")
    K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]], dtype=np.float64)
    R = _rand_rot()
    t = np.array([0.05, -0.1, 1.2])
    pts3d = RNG.normal(size=(60, 3)) * 0.2
    cam = pts3d @ R.T + t
    uv = cam @ K.T
    uv = uv[:, :2] / uv[:, 2:]
    pose = pnp_pose(pts3d, uv, K, ransac=False)
    np.testing.assert_allclose(pose[:, :3], R, atol=1e-3)
    np.testing.assert_allclose(pose[:, 3], t, atol=1e-3)


def test_prepare_init_results_conversion():
    from catre_tpu.tools.prepare_init_results import convert_frame

    n = 3
    R = np.stack([_rand_rot() for _ in range(n)])
    nocs_scales = np.array([0.8, 1.1, 1.3])
    RTs = np.zeros((n, 4, 4))
    for i in range(n):
        RTs[i, :3, :3] = nocs_scales[i] * R[i]
        RTs[i, :3, 3] = [0, 0, 1]
        RTs[i, 3, 3] = 1
    preds = {
        "pred_RTs": RTs,
        "pred_scales": np.full((n, 3), 0.5),
        "pred_class_ids": np.array([1, 3, 6]),
        "pred_bboxes": np.tile([10, 20, 110, 140], (n, 1)),
        "pred_scores": np.array([0.9, 0.8, 0.7]),
        "gt_handle_visibility": np.array([1, 1, 0]),
    }
    masks = np.zeros((48, 64, n), dtype=int)
    masks[5:20, 5:20, :] = 1
    entries = convert_frame(preds, masks)
    assert len(entries) == n
    for i, e in enumerate(entries):
        pose = np.array(e["pose_est"])
        # rotation un-scaled back to orthonormal
        np.testing.assert_allclose(pose[:3, :3], R[i], atol=1e-6)
        np.testing.assert_allclose(np.array(e["scale_est"]), 0.5 * nocs_scales[i], atol=1e-6)
        assert e["bbox_est"] == [20, 10, 140, 110]  # yxyx -> xyxy
    # json-serializable
    json.dumps(entries)


def test_pose_data_label_generation(tmp_path):
    """Synthesize one NOCS-format frame with known pose; process_frame must
    recover it via Umeyama."""
    cv2 = pytest.importorskip("cv2")
    from catre_tpu.data import meta
    from catre_tpu.tools.pose_data import process_frame

    K = meta.REAL_INTRINSICS
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    # object: plate at z=1m, nocs coords varying over the window
    depth = np.zeros((h, w), dtype=np.uint16)
    mask = np.zeros((h, w), dtype=np.uint8)
    coord_bgr = np.zeros((h, w, 3), dtype=np.uint8)
    cy, cx, half = 240, 320, 40
    ys, xs = np.mgrid[cy - half : cy + half, cx - half : cx + half]
    # gt: identity rotation, t = backprojection of the window, nocs_scale s
    s_gt = 0.4
    # nocs = (cam_pts - t) / s_gt with t at window center, z=1
    t_gt = np.array([(cx - K[0, 2]) / K[0, 0], (cy - K[1, 2]) / K[1, 1], 1.0])
    X = (xs - K[0, 2]) / K[0, 0]
    Y = (ys - K[1, 2]) / K[1, 1]
    nocs = np.stack([(X - t_gt[0]) / s_gt, (Y - t_gt[1]) / s_gt, np.zeros_like(X)], axis=2)
    assert np.abs(nocs).max() < 0.5
    rgb = np.clip((nocs + 0.5) * 255, 0, 255).astype(np.uint8)
    bgr = rgb[:, :, ::-1].copy()
    bgr[:, :, 0] = np.clip((1.0 - (nocs[:, :, 2] + 0.5)) * 255, 0, 255).astype(np.uint8)

    depth[ys, xs] = 1000
    mask[ys, xs] = 7
    coord_bgr[ys, xs] = bgr

    base = str(tmp_path / "0000")
    cv2.imwrite(base + "_depth.png", depth)
    cv2.imwrite(base + "_mask.png", mask)
    cv2.imwrite(base + "_coord.png", coord_bgr)
    with open(base + "_meta.txt", "w") as f:
        f.write("7 1 bottle_red_stanford_norm\n")

    label = process_frame(base, K, method="umeyama")
    assert label is not None and label["instance_ids"] == [7]
    # 8-bit coord quantization limits precision
    assert label["scales"][0] == pytest.approx(s_gt, rel=0.05)
    np.testing.assert_allclose(label["translations"][0], t_gt, atol=0.02)


def _synth_nocs_frame(tmp_path, s_gt=0.4, name="0000"):
    """One synthetic NOCS-format frame (plate at z=1m, identity rotation);
    returns (base_path, K, t_gt)."""
    import cv2

    from catre_tpu.data import meta

    K = meta.REAL_INTRINSICS
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    depth = np.zeros((h, w), dtype=np.uint16)
    mask = np.zeros((h, w), dtype=np.uint8)
    coord_bgr = np.zeros((h, w, 3), dtype=np.uint8)
    cy, cx, half = 240, 320, 40
    ys, xs = np.mgrid[cy - half : cy + half, cx - half : cx + half]
    t_gt = np.array([(cx - K[0, 2]) / K[0, 0], (cy - K[1, 2]) / K[1, 1], 1.0])
    X = (xs - K[0, 2]) / K[0, 0]
    Y = (ys - K[1, 2]) / K[1, 1]
    nocs = np.stack([(X - t_gt[0]) / s_gt, (Y - t_gt[1]) / s_gt,
                     np.zeros_like(X)], axis=2)
    rgb = np.clip((nocs + 0.5) * 255, 0, 255).astype(np.uint8)
    bgr = rgb[:, :, ::-1].copy()
    bgr[:, :, 0] = np.clip((1.0 - (nocs[:, :, 2] + 0.5)) * 255, 0, 255).astype(np.uint8)
    depth[ys, xs] = 1000
    mask[ys, xs] = 7
    coord_bgr[ys, xs] = bgr
    base = str(tmp_path / name)
    cv2.imwrite(base + "_depth.png", depth)
    cv2.imwrite(base + "_mask.png", mask)
    cv2.imwrite(base + "_coord.png", coord_bgr)
    with open(base + "_meta.txt", "w") as f:
        f.write("7 1 bottle_red_stanford_norm\n")
    return base, K, t_gt


def test_pose_data_pnp_with_scale_factor(tmp_path):
    """REAL-train PnP path: the NOCS scale comes from abs_scale a priori
    (ref `pose_data.py:347-351, 381-389`) — pose recovered with the right
    translation magnitude (the old hardcoded scale=1.0 path could not)."""
    pytest.importorskip("cv2")
    from catre_tpu.tools.pose_data import process_frame

    s_gt = 0.4
    base, K, t_gt = _synth_nocs_frame(tmp_path, s_gt=s_gt)
    label = process_frame(base, K, method="pnp",
                          scale_factors={"bottle_red_stanford_norm": s_gt})
    assert label is not None and label["scales"][0] == pytest.approx(s_gt)
    np.testing.assert_allclose(label["translations"][0], t_gt, atol=0.03)
    np.testing.assert_allclose(label["rotations"][0], np.eye(3), atol=0.1)

    with pytest.raises(KeyError):
        process_frame(base, K, method="pnp", scale_factors={})


def test_pose_data_test_merge(tmp_path):
    """REAL-test gts merge (ref `pose_data.py:419-520`): match by class +
    bbox, decompose gt_RTs, copy handle visibility, model sizes."""
    pytest.importorskip("cv2")
    from catre_tpu.tools.pose_data import (merge_test_gts,
                                           model_sizes_from_points,
                                           nocs_scale_factors)

    s_gt = 0.4
    base, K, t_gt = _synth_nocs_frame(tmp_path, s_gt=s_gt)
    # the frame's single instance occupies rows/cols 200..279 / 280..359
    bbox = [200, 280, 279, 359]
    sRT = np.identity(4)
    sRT[:3, :3] = s_gt * np.eye(3)
    sRT[:3, 3] = t_gt
    nocs_gt = {
        "gt_class_ids": np.array([3, 1]),  # decoy first
        "gt_bboxes": np.array([[0, 0, 10, 10], bbox]),
        "gt_RTs": np.stack([np.identity(4), sRT]),
        "gt_handle_visibility": np.array([1, 0]),
    }
    models = {"bottle_red_stanford_norm": np.array([[0.3, 0.5, 0.2],
                                                    [-0.3, -0.5, -0.2]])}
    sizes = model_sizes_from_points(models)
    np.testing.assert_allclose(sizes["bottle_red_stanford_norm"], [0.6, 1.0, 0.4])

    label = merge_test_gts(base, nocs_gt, sizes)
    assert label is not None
    assert label["handle_visibility"].tolist() == [0]  # matched entry 1
    assert label["scales"][0] == pytest.approx(s_gt, rel=1e-5)
    np.testing.assert_allclose(label["translations"][0], t_gt, atol=1e-6)
    np.testing.assert_allclose(label["poses"][0][:3, :3], s_gt * np.eye(3),
                               atol=1e-6)
    assert nocs_scale_factors({"m": [3.0, 4.0, 0.0]})["m"] == pytest.approx(5.0)

    # unmatched instance asserts (reference behavior, `pose_data.py:497-500`)
    bad = dict(nocs_gt, gt_bboxes=np.array([[0, 0, 10, 10], [0, 0, 20, 20]]))
    with pytest.raises(AssertionError):
        merge_test_gts(base, bad, sizes)
