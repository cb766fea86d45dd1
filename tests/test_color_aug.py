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

    with pytest.raises(ValueError):
        build_color_augmentor("code_albu", "")  # requires a chain string
    with pytest.raises(ValueError):
        build_color_augmentor("nope")


# the reference's embedded code_albu example chain
# (`base_data_loader.py:292-317`), minus nothing — evaluated verbatim
_ALBU_REF_CHAIN = """Compose([
    CoarseDropout(max_height=0.05*480, max_holes=0.05*640, p=0.4),
    OneOf([
        IAAAdditiveGaussianNoise(p=0.5),
        GaussNoise(p=0.5),
    ], p=0.2),
    OneOf([
        MotionBlur(p=0.2),
        MedianBlur(blur_limit=3, p=0.1),
        Blur(blur_limit=3, p=0.1),
    ], p=0.2),
    OneOf([
        CLAHE(clip_limit=2),
        IAASharpen(),
        IAAEmboss(),
        RandomBrightnessContrast(),
    ], p=0.3),
    InvertImg(p=0.2),
    RGBShift(r_shift_limit=105, g_shift_limit=45, b_shift_limit=40, p=0.5),
    RandomContrast(limit=0.9, p=0.5),
    RandomGamma(gamma_limit=(80,120), p=0.5),
    RandomBrightness(limit=1.2, p=0.5),
    HueSaturationValue(hue_shift_limit=172, sat_shift_limit=20, val_shift_limit=27, p=0.3),
    JpegCompression(quality_lower=4, quality_upper=100, p=0.4),
], p=0.8)"""


def test_code_albu_reference_chain_evaluates():
    """COLOR_AUG_TYPE='code_albu' (`base_data_loader.py:285-318`): the
    reference's own albumentations chain string evaluates and produces valid,
    seed-deterministic uint8 output."""
    from catre_tpu.data.aug_color import build_color_augmentor

    aug = build_color_augmentor("code_albu", _ALBU_REF_CHAIN)
    img = np.random.default_rng(0).integers(0, 256, size=(48, 64, 3),
                                            dtype=np.uint8)
    out = aug(np.random.default_rng(7), img.copy())
    assert out.shape == img.shape and out.dtype == np.uint8
    out2 = aug(np.random.default_rng(7), img.copy())
    np.testing.assert_array_equal(out, out2)
    # p=0.8 outer gate: some seeds must change the image, some must not
    changed = [bool((aug(np.random.default_rng(s), img.copy()) != img).any())
               for s in range(40)]
    assert any(changed) and not all(changed)


def test_code_albu_geometric_transforms_fail_loudly():
    from catre_tpu.data.aug_color import build_color_augmentor

    with pytest.raises(NotImplementedError, match="geometric warp"):
        build_color_augmentor(
            "code_albu", "Compose([ShiftScaleRotate(p=0.5)])")


def test_albu_op_semantics():
    """Distribution/semantics checks for the albumentations-style ops."""
    from catre_tpu.data.aug_color import (AlbuCoarseDropout, AlbuInvertImg,
                                          AlbuOneOf, AlbuRandomBrightnessContrast,
                                          AlbuRandomGamma, AlbuRGBShift)

    img = np.full((64, 64, 3), 100, np.uint8)
    rng = np.random.default_rng(0)

    # CoarseDropout: exactly max_holes holes of max_height x max_width
    # (albumentations min_* default to max_*) -> some zeros, bounded area
    out = AlbuCoarseDropout(max_holes=4, max_height=8, max_width=8, p=1.0)(
        rng, img)
    z = (out == 0).all(-1).sum()
    assert 0 < z <= 4 * 8 * 8

    assert (AlbuInvertImg(p=1.0)(rng, img) == 155).all()

    # OneOf force-applies exactly one child regardless of child p
    marker = AlbuInvertImg(p=0.0)  # would never self-apply
    out = AlbuOneOf([marker], p=1.0)(rng, img)
    assert (out == 155).all()

    # identity parameters -> identity output
    out = AlbuRandomBrightnessContrast(brightness_limit=0.0,
                                       contrast_limit=0.0, p=1.0)(rng, img)
    np.testing.assert_array_equal(out, img)
    out = AlbuRandomGamma(gamma_limit=(100, 100), p=1.0)(rng, img)
    np.testing.assert_array_equal(out, img)

    # RGBShift with zero limits is identity; nonzero shifts move channels
    out = AlbuRGBShift(0, 0, 0, p=1.0)(rng, img)
    np.testing.assert_array_equal(out, img)
    out = AlbuRGBShift(50, 50, 50, p=1.0)(np.random.default_rng(3), img)
    assert (out != img).any()


def test_build_bg_paths_sources(tmp_path):
    """INPUT.BG_TYPE path tables (`base_data_loader.py:361-411`): coco flat
    dir, VOC JPEGImages, VOC_table's diningtable_trainval filter."""
    from catre_tpu.data.aug_color import build_bg_paths

    # coco: flat dir
    coco = tmp_path / "coco"
    coco.mkdir()
    for i in range(3):
        cv2.imwrite(str(coco / f"im{i}.jpg"), np.full((8, 8, 3), i, np.uint8))
    paths = build_bg_paths("coco", str(coco), num_bg_imgs=2, seed=0)
    assert len(paths) == 2 and all(str(coco) in p for p in paths)

    # VOC layout
    voc = tmp_path / "VOC2012"
    (voc / "JPEGImages").mkdir(parents=True)
    (voc / "ImageSets/Main").mkdir(parents=True)
    for name in ["a", "b", "c"]:
        cv2.imwrite(str(voc / "JPEGImages" / f"{name}.jpg"),
                    np.zeros((8, 8, 3), np.uint8))
    paths = build_bg_paths("VOC", str(voc), num_bg_imgs=10, seed=0)
    assert len(paths) == 3

    # VOC_table: only images flagged 1 in diningtable_trainval.txt
    (voc / "ImageSets/Main/diningtable_trainval.txt").write_text(
        "a  1\nb -1\nc  1\n")
    paths = build_bg_paths("VOC_table", str(voc), num_bg_imgs=10, seed=0)
    assert paths and all(p.endswith(("a.jpg", "c.jpg")) for p in paths)

    # SUN_RGBD is the depth pool -> loud failure; unknown type -> ValueError
    with pytest.raises(NotImplementedError):
        build_bg_paths("SUN_RGBD", str(tmp_path))
    with pytest.raises(ValueError):
        build_bg_paths("wat", str(tmp_path))


def test_replace_background_voc_source(tmp_path):
    """replace_background draws from the typed pool (VOC here) and the
    keep-aspect fit never distorts: constant bg stays constant."""
    voc = tmp_path / "VOC2012"
    (voc / "JPEGImages").mkdir(parents=True)
    cv2.imwrite(str(voc / "JPEGImages/x.jpg"),
                np.full((24, 48, 3), 200, np.uint8))
    img = np.full((32, 32, 3), 10, np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:16, 8:16] = True
    out = replace_background(np.random.default_rng(0), img, mask, str(voc),
                             bg_type="VOC")
    assert (out[mask] == 10).all()
    assert (np.abs(out[~mask].astype(int) - 200) <= 8).all()  # jpeg tolerance


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
