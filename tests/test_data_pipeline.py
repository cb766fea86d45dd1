"""End-to-end data pipeline test on a synthetic on-disk NOCS-format scene:
dataset dict building -> host decode -> device ball-crop sampling -> padded
flattened batch."""

import os
import os.path as osp
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data import meta
from catre_tpu.data.loader import CATRELoader, LoaderConfig, load_depth
from catre_tpu.data.nocs import NOCSDataset, binary_mask_to_rle, rle_to_binary_mask


@pytest.fixture(scope="module")
def fake_real_root(tmp_path_factory):
    """Two frames of a fake REAL275 test split; one bottle instance each."""
    root = tmp_path_factory.mktemp("REAL")
    split_dir = root / "real_test" / "scene_1"
    split_dir.mkdir(parents=True)
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    K = meta.REAL_INTRINSICS

    lines = []
    for i in range(2):
        im_id = f"{i:04d}"
        # object: fronto-parallel plate at z=1m in a 60x60 px window
        depth = np.zeros((h, w), dtype=np.uint16)
        cy, cx = 240 + 5 * i, 320 - 7 * i
        depth[cy - 30 : cy + 30, cx - 30 : cx + 30] = 1000  # 1m in mm
        mask = np.zeros((h, w), dtype=np.uint8)
        mask[cy - 25 : cy + 25, cx - 25 : cx + 25] = 3  # instance id 3
        color = np.zeros((h, w, 3), dtype=np.uint8)

        # gt translation: backprojected window center
        t = np.array([(cx - K[0, 2]) / K[0, 0], (cy - K[1, 2]) / K[1, 1], 1.0], np.float32)
        label = {
            "instance_ids": [3],
            "class_ids": [1],  # bottle
            "model_list": ["bottle_red_stanford_norm"],
            "rotations": [np.eye(3, dtype=np.float32)],
            "translations": [t],
            "scales": [1.0],
            "bboxes": [[cy - 25, cx - 25, cy + 25, cx + 25]],  # yxyx
        }
        base = split_dir / im_id
        cv2.imwrite(str(base) + "_depth.png", depth)
        cv2.imwrite(str(base) + "_mask.png", mask)
        cv2.imwrite(str(base) + "_color.png", color)
        with open(str(base) + "_label.pkl", "wb") as f:
            pickle.dump(label, f)
        lines.append(f"real_test/scene_1/{im_id}")

    with open(root / "real_test_list_all.txt", "w") as f:
        f.write("\n".join(lines))
    return str(root)


def test_rle_roundtrip():
    m = np.zeros((12, 9), dtype=bool)
    m[3:7, 2:5] = True
    m[0, 0] = True
    rle = binary_mask_to_rle(m)
    np.testing.assert_array_equal(rle_to_binary_mask(rle), m)


def test_dataset_vis_harness(fake_real_root, tmp_path):
    """`python -m catre_tpu.data.nocs <name>` visual harness (headless) —
    analogue of the reference's dataset test_vis (`datasets/nocs.py:479-550`)."""
    import catre_tpu.data.nocs as nocs_mod

    nocs_mod._DATASET_REGISTRY["nocs_test_real"] = NOCSDataset(
        "nocs_test_real", image_root=fake_real_root, use_cache=False)
    out = tmp_path / "vis"
    rc = nocs_mod._vis_main(["nocs_test_real", "--num", "1", "--out", str(out)])
    assert rc == 0
    assert list(out.glob("*.png"))


def test_dataset_dicts(fake_real_root):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    assert len(dicts) == 2
    rec = dicts[0]
    assert rec["scene_im_id"] == "scene_1/0000"
    assert len(rec["annotations"]) == 1
    anno = rec["annotations"][0]
    assert anno["category_id"] == 0  # bottle is label 0
    assert anno["pose"].shape == (3, 4)
    assert anno["scale"].shape == (3,)  # abs scale from the asset pickle
    m = rle_to_binary_mask(anno["segmentation"])
    assert m.sum() == 50 * 50


def test_loader_test_phase(fake_real_root):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    # gt-as-estimate mode: use gt pose/scale as init (annotations carry pose)
    for rec in dicts:
        for anno in rec["annotations"]:
            anno["pose_est"] = anno["pose"]
            anno["scale_est"] = anno["scale"]
            anno["score"] = 0.9

    cfg = LoaderConfig(num_pcl=256, max_objs_per_image=4, aug_depth=False)
    loader = CATRELoader(dicts, cfg, phase="test", ims_per_batch=1)
    batches = list(iter(loader))
    assert len(batches) == 2
    b = batches[0]
    assert b["pcl"].shape == (4, 256, 3)
    assert b["valid"].sum() == 1
    assert b["obj_cls"][0] == 0
    assert bool(b["sym_flag"][0])  # bottle is y-axis symmetric
    # sampled points lie on the z=1 plate near the gt translation; the
    # equality is EXACT — the test-phase u16-mm depth transfer must be
    # bit-identical to the host f32 value (1000 mm -> 1.0)
    pcl0 = b["pcl"][0]
    assert np.all(pcl0[:, 2] == np.float32(1.0))
    t = b["obj_pose"][0, :, 3]
    assert np.linalg.norm(pcl0.mean(axis=0) - t) < 0.05
    assert b["obj_mean_points"].shape == (4, 1024, 3)


def test_loader_train_phase(fake_real_root):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    cfg = LoaderConfig(num_pcl=128, max_objs_per_image=4, aug_depth=True)
    loader = CATRELoader(dicts, cfg, phase="train", ims_per_batch=2, seed=1)
    it = iter(loader)
    b = next(it)
    assert b["pcl"].shape == (8, 128, 3)
    assert b["valid"].sum() == 2
    assert b["K"].shape == (8, 3, 3)
    assert b["obj_mean_scales"].shape == (8, 3)
    # infinite iterator: another batch comes out
    b2 = next(it)
    assert b2["pcl"].shape == (8, 128, 3)


def test_load_depth_16bit(tmp_path, fake_real_root):
    p = osp.join(fake_real_root, "real_test/scene_1/0000_depth.png")
    d = load_depth(p)
    assert d.dtype == np.float32
    assert d.max() == pytest.approx(1.0)


def test_test_loader_interleaved_empties_and_partial_group(fake_real_root):
    """The double-buffered test pipeline must account for EVERY record exactly
    once: undecodable records (no annotations) yield empty markers, decodable
    ones appear in fixed-size flattened groups, and a trailing partial group
    is padded (valid=False, scene_im_id=None) rather than dropped."""
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    base = ds()  # 2 valid frames

    # build 5 valid records (reusing the two on-disk frames) + 3 undecodable
    records = []
    for i in range(5):
        rec = dict(base[i % 2])
        rec["scene_im_id"] = f"scene_1/{i:04d}v"
        records.append(rec)
        if i < 3:
            records.append({"scene_im_id": f"scene_1/{i:04d}e", "annotations": [],
                            "height": meta.IM_HEIGHT, "width": meta.IM_WIDTH,
                            "depth_file": "missing.png",
                            "cam": np.asarray(meta.REAL_INTRINSICS)})

    cfg = LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=False)
    loader = CATRELoader(records, cfg, phase="test", ims_per_batch=2)

    seen_valid, seen_empty = [], []
    for batch in loader:
        if batch.get("empty"):
            seen_empty.append(batch["scene_im_ids"][0])
            continue
        assert len(batch["scene_im_ids"]) == 2  # padded to ims_per_batch
        assert batch["pcl"].shape == (4, 64, 3)
        for i, sid in enumerate(batch["scene_im_ids"]):
            if sid is None:  # final-group padding image
                rows = np.asarray(batch["valid"])[np.asarray(batch["im_id"]) == i]
                assert not rows.any()
            else:
                seen_valid.append(sid)

    assert sorted(seen_valid) == [f"scene_1/{i:04d}v" for i in range(5)]
    assert sorted(seen_empty) == [f"scene_1/{i:04d}e" for i in range(3)]


def test_per_object_split_uses_global_labels(tmp_path):
    """Per-object subset splits must carry GLOBAL category ids so sym flags,
    mean-shape lookups, and the eval protocol's symmetric-class set stay
    correct (the reference keeps subset-relative labels + an evaluator
    remap; we key everything global — see NOCSDataset design note).
    Regression: laptop (non-symmetric, global label 4) in a single-object
    split used to come out as label 0 = bottle (symmetric)."""
    root = tmp_path / "REAL"
    split_dir = root / "real_test" / "scene_1"
    split_dir.mkdir(parents=True)
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    depth = np.zeros((h, w), dtype=np.uint16)
    depth[200:300, 200:300] = 1000
    mask = np.zeros((h, w), dtype=np.uint8)
    mask[210:290, 210:290] = 7
    label = {
        "instance_ids": [7],
        "class_ids": [5],  # laptop (1-based global)
        "model_list": ["laptop_fake_norm"],
        "rotations": [np.eye(3, dtype=np.float32)],
        "translations": [np.array([0, 0, 1.0], np.float32)],
        "scales": [1.0],
        "bboxes": [[210, 210, 290, 290]],
    }
    base = split_dir / "0000"
    cv2.imwrite(str(base) + "_depth.png", depth)
    cv2.imwrite(str(base) + "_mask.png", mask)
    cv2.imwrite(str(base) + "_color.png", np.zeros((h, w, 3), np.uint8))
    with open(str(base) + "_label.pkl", "wb") as f:
        pickle.dump(label, f)
    (root / "real_test_list_all.txt").write_text("real_test/scene_1/0000")

    ds = NOCSDataset("nocs_test_real_laptop", objs=["laptop"],
                     image_root=str(root), use_cache=False)
    dicts = ds()
    assert len(dicts) == 1
    anno = dicts[0]["annotations"][0]
    assert anno["category_id"] == meta.OBJECTS.index("laptop") == 4

    from catre_tpu.data.loader import CATRELoader, LoaderConfig
    anno["pose_est"] = anno["pose"]
    anno["scale_est"] = anno["scale"]
    anno["score"] = 1.0
    ld = CATRELoader(dicts, LoaderConfig(num_pcl=64, max_objs_per_image=1,
                                         aug_depth=False),
                     phase="test", ims_per_batch=1, seed=0)
    (batch,) = [b for b in ld if not b.get("empty")]
    assert int(np.asarray(batch["obj_cls"])[0]) == 4
    assert not bool(np.asarray(batch["sym_flag"])[0])  # laptop: not symmetric
    # mean shape row 4 (laptop), not row 0 (bottle)
    from catre_tpu.data import assets
    mean_pts = assets.mean_shape_array()
    np.testing.assert_allclose(np.asarray(batch["obj_mean_points"])[0],
                               np.asarray(mean_pts)[4], atol=0)
