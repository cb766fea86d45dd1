"""Aligned NOCS-coordinate sampling in the loader (with_nocs)."""

import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data import meta
from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset


@pytest.fixture
def coord_root(tmp_path):
    root = tmp_path / "REAL"
    split_dir = root / "real_test" / "scene_1"
    split_dir.mkdir(parents=True)
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    K = meta.REAL_INTRINSICS

    depth = np.zeros((h, w), dtype=np.uint16)
    mask = np.zeros((h, w), dtype=np.uint8)
    cy, cx = 240, 320
    depth[cy - 30 : cy + 30, cx - 30 : cx + 30] = 1000
    mask[cy - 25 : cy + 25, cx - 25 : cx + 25] = 3

    # coord map: R channel encodes the column, G the row (linear ramps)
    coord_bgr = np.zeros((h, w, 3), dtype=np.uint8)
    cols = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :], (h, w))
    rows = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None], (h, w))
    coord_bgr[:, :, 2] = (cols / w * 255).astype(np.uint8)  # BGR: R channel
    coord_bgr[:, :, 1] = (rows / h * 255).astype(np.uint8)

    t = np.array([(cx - K[0, 2]) / K[0, 0], (cy - K[1, 2]) / K[1, 1], 1.0], np.float32)
    label = {
        "instance_ids": [3],
        "class_ids": [1],
        "model_list": ["bottle_red_stanford_norm"],
        "rotations": [np.eye(3, dtype=np.float32)],
        "translations": [t],
        "scales": [1.0],
        "bboxes": [[cy - 25, cx - 25, cy + 25, cx + 25]],
    }
    base = split_dir / "0000"
    cv2.imwrite(str(base) + "_depth.png", depth)
    cv2.imwrite(str(base) + "_mask.png", mask)
    cv2.imwrite(str(base) + "_coord.png", coord_bgr)
    cv2.imwrite(str(base) + "_color.png", np.zeros((h, w, 3), np.uint8))
    with open(str(base) + "_label.pkl", "wb") as f:
        pickle.dump(label, f)
    with open(root / "real_test_list_all.txt", "w") as f:
        f.write("real_test/scene_1/0000\n")
    return str(root)


def test_nocs_aligned_with_pcl(coord_root):
    ds = NOCSDataset("nocs_test_real", image_root=coord_root, use_cache=False,
                     with_coord=True)
    dicts = ds()
    for rec in dicts:
        for anno in rec["annotations"]:
            anno["pose_est"] = anno["pose"]
            anno["scale_est"] = anno["scale"]
    cfg = LoaderConfig(num_pcl=128, max_objs_per_image=2, aug_depth=False,
                       with_nocs=True)
    loader = CATRELoader(dicts, cfg, phase="test", ims_per_batch=1)
    batch = next(iter(loader))
    assert "nocs" in batch
    nocs = batch["nocs"][0]  # (128, 3)
    pcl = batch["pcl"][0]
    K = meta.REAL_INTRINSICS
    # reproject sampled points to pixels; the coord map encodes col/row ramps
    u = pcl[:, 0] / pcl[:, 2] * K[0, 0] + K[0, 2]
    v = pcl[:, 1] / pcl[:, 2] * K[1, 1] + K[1, 2]
    expected_r = np.floor(u / meta.IM_WIDTH * 255) / 255.0 - 0.5  # decoded R channel
    np.testing.assert_allclose(nocs[:, 0], expected_r, atol=0.01)
    expected_g = np.floor(v / meta.IM_HEIGHT * 255) / 255.0 - 0.5
    np.testing.assert_allclose(nocs[:, 1], expected_g, atol=0.01)
