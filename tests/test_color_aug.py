"""Color augmentation + background replacement (base_data_loader.py:233-553
equivalents) — unit behavior and loader integration."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data.aug_color import color_augment, replace_background
from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset

from test_data_pipeline import fake_real_root  # noqa: F401


def test_color_augment_uint8_range_and_shape():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    out = color_augment(np.random.default_rng(1), img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # seeded determinism
    out2 = color_augment(np.random.default_rng(1), img)
    np.testing.assert_array_equal(out, out2)
    # different seed -> (overwhelmingly) different image
    out3 = color_augment(np.random.default_rng(2), img)
    assert (out != out3).any()


def test_color_augment_float_stays_in_range():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    out = color_augment(np.random.default_rng(3), img)
    assert out.dtype == np.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_replace_background(tmp_path):
    bg = np.full((16, 16, 3), 200, np.uint8)  # saved BGR==RGB (gray)
    cv2.imwrite(str(tmp_path / "bg.png"), bg)
    img = np.full((32, 32, 3), 10, np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:16, 8:16] = True
    out = replace_background(np.random.default_rng(0), img, mask, str(tmp_path))
    assert (out[mask] == 10).all()          # foreground untouched
    assert (out[~mask] == 200).all()        # background replaced
    # empty dir -> no-op
    out2 = replace_background(np.random.default_rng(0), img, mask,
                              str(tmp_path / "nope"))
    np.testing.assert_array_equal(out2, img)


def test_loader_color_aug_changes_rgb(fake_real_root):  # noqa: F811
    # the fixture's color images are black (color ops are no-ops at 0) —
    # give them real content so the aug is observable in sampled rgb
    import pathlib

    rng = np.random.default_rng(5)
    for p in pathlib.Path(fake_real_root).rglob("*_color.png"):
        img = rng.integers(30, 220, size=(480, 640, 3), dtype=np.uint8)
        cv2.imwrite(str(p), img)

    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()

    def batch_with(prob):
        cfg = LoaderConfig(num_pcl=32, max_objs_per_image=2, aug_depth=False,
                           pcl_with_color=True, color_aug_prob=prob)
        loader = CATRELoader(dicts, cfg, phase="train", ims_per_batch=1, seed=11)
        return next(iter(loader))

    plain = batch_with(0.0)
    auged = batch_with(1.0)
    assert auged["pcl_rgb"].shape == plain["pcl_rgb"].shape
    assert (auged["pcl_rgb"] >= 0).all() and (auged["pcl_rgb"] <= 1).all()
    # same seed, same sampled indices -> any difference comes from the aug
    assert not np.allclose(auged["pcl_rgb"], plain["pcl_rgb"])
