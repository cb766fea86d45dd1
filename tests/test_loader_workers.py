"""Threaded host-stage prefetching must produce identical batches to the
sequential path (seeded)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset

from test_data_pipeline import fake_real_root  # noqa: F401


def test_workers_match_sequential(fake_real_root):  # noqa: F811
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    for rec in dicts:
        for anno in rec["annotations"]:
            anno["pose_est"] = anno["pose"]
            anno["scale_est"] = anno["scale"]

    cfg = LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=False)
    batches = {}
    for nw in (0, 3):
        loader = CATRELoader(dicts, cfg, phase="test", ims_per_batch=1, seed=7,
                             num_workers=nw)
        batches[nw] = list(iter(loader))
    assert len(batches[0]) == len(batches[3]) == 2
    for b0, b3 in zip(batches[0], batches[3]):
        np.testing.assert_allclose(b0["pcl"], b3["pcl"])
        np.testing.assert_array_equal(b0["obj_cls"], b3["obj_cls"])


def test_workers_train_infinite(fake_real_root):  # noqa: F811
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    cfg = LoaderConfig(num_pcl=32, max_objs_per_image=2, aug_depth=True)
    loader = CATRELoader(dicts, cfg, phase="train", ims_per_batch=2, seed=1,
                         num_workers=2)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["pcl"].shape == (4, 32, 3)
    assert b2["pcl"].shape == (4, 32, 3)

def test_pcl_with_color(fake_real_root):  # noqa: F811
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    for rec in dicts:
        for anno in rec["annotations"]:
            anno["pose_est"] = anno["pose"]
            anno["scale_est"] = anno["scale"]
    cfg = LoaderConfig(num_pcl=32, max_objs_per_image=2, aug_depth=False,
                       pcl_with_color=True)
    loader = CATRELoader(dicts, cfg, phase="test", ims_per_batch=1)
    batch = next(iter(loader))
    assert "pcl_rgb" in batch
    assert batch["pcl_rgb"].shape == (2, 32, 3)
    assert (batch["pcl_rgb"] >= 0).all() and (batch["pcl_rgb"] <= 1).all()
