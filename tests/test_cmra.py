"""CAMERA25 (cmra) dataset split support."""

import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data import meta
from catre_tpu.data.nocs import NOCSDataset


def test_cmra_abs_scale_from_model_extents():
    model = np.array([[0.1, -0.2, 0.05], [-0.3, 0.4, -0.05], [0.2, 0.1, 0.15]], np.float32)
    s = NOCSDataset.get_abs_scale(model, 2.0, "bottle")
    np.testing.assert_allclose(s, [1.0, 1.2, 0.4], atol=1e-6)
    # mug: x extent symmetrized around 0
    s_mug = NOCSDataset.get_abs_scale(model, 2.0, "mug")
    np.testing.assert_allclose(s_mug[0], 2 * 0.3 * 2.0, atol=1e-6)


@pytest.fixture
def fake_cmra_root(tmp_path):
    root = tmp_path / "CAMERA"
    split_dir = root / "val" / "00001"
    split_dir.mkdir(parents=True)
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    depth = np.zeros((h, w), dtype=np.uint16)
    depth[200:280, 280:360] = 800
    mask = np.zeros((h, w), dtype=np.uint8)
    mask[210:270, 290:350] = 2
    color = np.zeros((h, w, 3), dtype=np.uint8)
    label = {
        "instance_ids": [2],
        "class_ids": [5],  # laptop
        "model_list": ["synthetic_laptop_xyz"],  # not in abs_scale.pkl
        "rotations": [np.eye(3, dtype=np.float32)],
        "translations": [np.array([0.0, 0.0, 0.8], np.float32)],
        "scales": [0.5],
        "bboxes": [[210, 290, 270, 350]],
    }
    base = split_dir / "0000"
    cv2.imwrite(str(base) + "_depth.png", depth)
    cv2.imwrite(str(base) + "_mask.png", mask)
    cv2.imwrite(str(base) + "_color.png", color)
    with open(str(base) + "_label.pkl", "wb") as f:
        pickle.dump(label, f)
    with open(root / "val_list_all.txt", "w") as f:
        f.write("val/00001/0000\n")
    return str(root)


def test_cmra_dataset_dicts(fake_cmra_root):
    ds = NOCSDataset("nocs_val_cmra", image_root=fake_cmra_root, use_cache=False)
    assert ds.split == "val"
    np.testing.assert_allclose(ds.cam, meta.CMRA_INTRINSICS)
    dicts = ds()
    assert len(dicts) == 1
    anno = dicts[0]["annotations"][0]
    assert anno["category_id"] == 4  # laptop 0-based
    # unknown instance -> isotropic fallback from nocs diagonal
    assert anno["scale"].shape == (3,)
    assert np.all(anno["scale"] > 0)
