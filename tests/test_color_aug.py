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


def test_color_aug_selector_families():
    """COLOR_AUG_TYPE selector (`base_data_loader.py:233-322`): roi10d, aae,
    and the reference's own aae chain string via 'code'."""
    from catre_tpu.data.aug_color import build_color_augmentor

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)

    for t in ["roi10d", "aae"]:
        aug = build_color_augmentor(t, seed=1)
        out = aug(np.random.default_rng(2), img.copy())
        assert out.shape == img.shape and out.dtype == np.uint8

    # the REFERENCE's shipped chain string evaluates against our namespace
    code = """Sequential([
        Sometimes(0.5, CoarseDropout( p=0.2, size_percent=0.05) ),
        Sometimes(0.5, GaussianBlur(1.2*np.random.rand())),
        Sometimes(0.5, Add((-25, 25), per_channel=0.3)),
        Sometimes(0.3, Invert(0.2, per_channel=True)),
        Sometimes(0.5, Multiply((0.6, 1.4), per_channel=0.5)),
        Sometimes(0.5, Multiply((0.6, 1.4))),
        Sometimes(0.5, LinearContrast((0.5, 2.2), per_channel=0.3))
        ], random_order = False)"""
    aug = build_color_augmentor("code", code)
    out = aug(np.random.default_rng(3), img.copy())
    assert out.shape == img.shape and out.dtype == np.uint8

    with pytest.raises(NotImplementedError):
        build_color_augmentor("code_albu", "Compose([])")
    with pytest.raises(ValueError):
        build_color_augmentor("nope")


def test_color_aug_ops_semantics():
    """Individual op behaviors match the imgaug semantics they mirror."""
    from catre_tpu.data.aug_color import (CoarseDropout, Invert,
                                          LinearContrast, Multiply)

    img = np.full((40, 40, 3), 200, np.uint8)
    rng = np.random.default_rng(0)
    dropped = CoarseDropout(p=0.5, size_percent=0.1)(rng, img)
    frac = (dropped == 0).all(-1).mean()
    assert 0.2 < frac < 0.8  # coarse blocks actually dropped

    inv = Invert(p=1.0, per_channel=False)(rng, img)
    assert (inv == 55).all()

    doubled = Multiply((2.0, 2.0))(rng, np.full((4, 4, 3), 100, np.uint8))
    assert (doubled == 200).all()

    flat = LinearContrast((0.0, 0.0))(rng, img)
    assert (flat == 127).all()


def test_truncate_fg_bg_replace(tmp_path):
    """TRUNCATE_FG erases a half-plane of the foreground during background
    replacement (`base_data_loader.py:412-437`)."""
    import cv2

    from catre_tpu.data.aug_color import replace_background

    bg = np.full((32, 32, 3), 255, np.uint8)
    cv2.imwrite(str(tmp_path / "bg.png"), bg)
    img = np.zeros((32, 32, 3), np.uint8)
    fg = np.zeros((32, 32), bool)
    fg[8:24, 8:24] = True
    # the cut position/side is random — a single draw may erase all or none
    # of the fg; over seeds, partial truncation must occur
    kept = [int((replace_background(np.random.default_rng(s), img, fg,
                                    str(tmp_path), truncate_fg=True)[fg] == 0)
                .all(-1).sum()) for s in range(10)]
    assert any(0 < k < fg.sum() for k in kept), kept
    # and without truncation the whole fg survives
    out = replace_background(np.random.default_rng(0), img, fg, str(tmp_path))
    assert (out[fg] == 0).all()
