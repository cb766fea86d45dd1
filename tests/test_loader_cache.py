"""Device-side depth augmentation, decoded-tensor caches, and exact
loader/training resume determinism (round-3 input-path work)."""

import json
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset

from test_data_pipeline import fake_real_root  # noqa: F401  (fixture)


def _test_dicts(fake_real_root):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    for rec in dicts:
        for anno in rec["annotations"]:
            anno["pose_est"] = anno["pose"]
            anno["scale_est"] = anno["scale"]
            anno["score"] = 0.9
    return dicts


def _batches(loader, n=None):
    out = []
    for b in loader:
        if b.get("empty"):
            continue
        out.append(b)
        if n is not None and len(out) >= n:
            break
    return out


def test_device_depth_aug_semantics():
    """aug_depth mirrors `data_loader.py:530-543`: zeros filled with
    N(0, 0.1); with-prob pixel drop; with-prob bounded gaussian noise."""
    from catre_tpu.data.aug import aug_depth

    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 2.0, size=(64, 80)).astype(np.float32)
    depth[10:20, 10:30] = 0.0

    # aggregate over keys: every zero pixel must be filled (non-zero a.s.),
    # drop fraction ~ratio on dropped draws, noise bounded by the level
    filled = np.asarray(aug_depth(jax.random.PRNGKey(0), depth,
                                  drop_depth_prob=0.0, add_noise_depth_prob=0.0))
    zero_region = filled[10:20, 10:30]
    assert np.abs(zero_region).max() < 0.6  # ~N(0, 0.1), 6 sigma
    assert zero_region.std() == pytest.approx(0.1, rel=0.3)
    # non-zero pixels untouched when drop/noise disabled
    np.testing.assert_array_equal(filled[30:, :], depth[30:, :])

    dropped = np.asarray(aug_depth(jax.random.PRNGKey(1), depth,
                                   drop_depth_prob=1.0, drop_depth_ratio=0.2,
                                   add_noise_depth_prob=0.0))
    frac = (dropped[30:, :] == 0).mean()
    assert frac == pytest.approx(0.2, abs=0.03)

    noised = np.asarray(aug_depth(jax.random.PRNGKey(2), depth,
                                  drop_depth_prob=0.0, add_noise_depth_prob=1.0,
                                  add_noise_depth_level=0.01))
    delta = np.abs(noised[30:, :] - depth[30:, :])
    assert 0 < delta.max() < 0.01 * 6  # level is U(0, 0.01), noise N(0, level)


@pytest.mark.parametrize("mode", ["ram", "device"])
def test_cache_modes_match_uncached(fake_real_root, mode):  # noqa: F811
    """cache_decoded='ram'/'device' must produce batches identical to the
    decode-every-epoch path (same positional RNG, same device program)."""
    dicts = _test_dicts(fake_real_root)
    mk = lambda cache: CATRELoader(
        dicts, LoaderConfig(num_pcl=128, max_objs_per_image=2, aug_depth=False,
                            cache_decoded=cache),
        phase="test", ims_per_batch=1, seed=5)
    ref = _batches(mk(""))
    got = _batches(mk(mode))
    assert len(ref) == len(got) == 2
    for a, b in zip(ref, got):
        assert a["scene_im_ids"] == b["scene_im_ids"]
        np.testing.assert_allclose(a["pcl"], b["pcl"], atol=0)
        np.testing.assert_array_equal(a["obj_cls"], b["obj_cls"])
        np.testing.assert_allclose(a["obj_pose_est"], b["obj_pose_est"], atol=0)


def test_cache_train_aug_deterministic(fake_real_root):  # noqa: F811
    """Train phase with device-side depth aug: cached and uncached loaders
    draw identical augmentation (positional keys), and a second epoch draws
    DIFFERENT augmentation (position advances)."""
    dicts = _test_dicts(fake_real_root)
    mk = lambda cache: CATRELoader(
        dicts, LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=True,
                            cache_decoded=cache),
        phase="train", ims_per_batch=2, seed=9)
    b_plain = _batches(iter(mk("")), n=2)
    b_dev = _batches(iter(mk("device")), n=2)
    np.testing.assert_allclose(b_plain[0]["pcl"], b_dev[0]["pcl"], atol=0)
    np.testing.assert_allclose(b_plain[1]["pcl"], b_dev[1]["pcl"], atol=0)
    # different positions -> different aug/sampling
    assert not np.allclose(b_plain[0]["pcl"], b_plain[1]["pcl"])


def test_loader_skip_fast_forward(fake_real_root):  # noqa: F811
    """skip(n) reproduces the exact stream an uninterrupted run would see."""
    dicts = _test_dicts(fake_real_root)
    cfg = LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=True)
    full = _batches(iter(CATRELoader(dicts, cfg, phase="train",
                                     ims_per_batch=2, seed=4)), n=4)
    skipped = CATRELoader(dicts, cfg, phase="train", ims_per_batch=2, seed=4)
    skipped.skip(2 * 2)  # 2 batches x 2 images
    tail = _batches(iter(skipped), n=2)
    np.testing.assert_allclose(tail[0]["pcl"], full[2]["pcl"], atol=0)
    np.testing.assert_allclose(tail[1]["pcl"], full[3]["pcl"], atol=0)
    np.testing.assert_allclose(tail[0]["obj_pose"], full[2]["obj_pose"], atol=0)


def test_resume_is_bit_deterministic(tmp_path, fake_real_root):  # noqa: F811
    """Kill + --resume continues the EXACT stream of an uninterrupted run:
    per-iteration logged losses of the resumed run match the straight run
    bitwise (positional loader RNG + fold_in step keys + restored
    params/optimizer). The reference cannot do this (worker RNG state is
    lost on restart, engine.py:210-218 restores only module states)."""
    from catre_tpu.config.loader import apply_overrides, load_config
    from catre_tpu.data.nocs import _DATASET_REGISTRY
    from catre_tpu.engine.runner import do_train

    cfg_path = osp.join(
        osp.dirname(__file__),
        "../catre_tpu/configs/nocs_real/"
        "aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py")

    def make_cfg(out, epochs):
        cfg = load_config(cfg_path)
        apply_overrides(cfg, [
            f"SOLVER.TOTAL_EPOCHS={epochs}",
            "SOLVER.IMS_PER_BATCH=2",
            "SOLVER.WARMUP_ITERS=1",
            "SOLVER.CHECKPOINT_PERIOD=3",
            "INPUT.NUM_PCL=64",
            "INPUT.NUM_KPS=1024",
            "MODEL.CATRE.N_ITER_TRAIN=1",
            "MODEL.CATRE.N_ITER_TRAIN_WARM_EPOCH=0",
            "DATALOADER.MAX_OBJS_PER_IMAGE=2",
            "TRAIN.PRINT_FREQ=1",
            "SEED=7",
        ])
        cfg["OUTPUT_DIR"] = str(out)
        return cfg

    for name in ["nocs_train_real", "nocs_test_real"]:
        _DATASET_REGISTRY[name] = NOCSDataset(
            name.replace("train", "test"), image_root=fake_real_root,
            use_cache=False)

    def losses(out):
        recs = {}
        with open(osp.join(out, "metrics.json")) as f:
            for line in f:
                r = json.loads(line)
                recs[r["iteration"]] = r["loss_total"]
        return recs

    # straight run: 6 iterations (1 iter/epoch), ckpt at iters 2 and 5
    do_train(make_cfg(tmp_path / "a", 6), resume=False)
    # interrupted run: killed after iteration 2's checkpoint, then resumed
    do_train(make_cfg(tmp_path / "b", 3), resume=False)
    do_train(make_cfg(tmp_path / "b", 6), resume=True)

    la, lb = losses(tmp_path / "a"), losses(tmp_path / "b")
    assert set(la) == set(lb) == set(range(6))
    for it in range(6):
        assert la[it] == lb[it], f"iteration {it}: {la[it]} != {lb[it]}"


def test_device_batches_keeps_pcl_on_device(fake_real_root):  # noqa: F811
    """device_batches=True yields a jax-array pcl identical to the host-path
    value, with no '_pcl_group' leaking into the image dicts."""
    dicts = _test_dicts(fake_real_root)
    cfg = LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=True)
    host = _batches(iter(CATRELoader(dicts, cfg, phase="train",
                                     ims_per_batch=2, seed=3)), n=2)
    dev = _batches(iter(CATRELoader(dicts, cfg, phase="train",
                                    ims_per_batch=2, seed=3,
                                    device_batches=True)), n=2)
    for a, b in zip(host, dev):
        assert isinstance(b["pcl"], jax.Array)
        np.testing.assert_allclose(np.asarray(b["pcl"]), a["pcl"], atol=0)
        np.testing.assert_array_equal(a["valid"], b["valid"])


@pytest.mark.parametrize("cache,ims", [("", 2), ("device", 2), ("", 4),
                                       ("device", 4)])
def test_device_batches_test_phase(fake_real_root, cache, ims):  # noqa: F811
    """Test-phase device_batches (cached and uncached, incl. the padded
    trailing partial group at ims=4 > 2 records): pcl stays a jax array and
    matches the host-path batch bit-for-bit."""
    dicts = _test_dicts(fake_real_root)
    mk = lambda dev: CATRELoader(
        dicts, LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=False,
                            cache_decoded=cache),
        phase="test", ims_per_batch=ims, seed=5, device_batches=dev)
    host = _batches(iter(mk(False)))
    dev = _batches(iter(mk(True)))
    assert len(host) == len(dev) == 1
    for a, b in zip(host, dev):
        assert isinstance(b["pcl"], jax.Array)
        assert a["scene_im_ids"] == b["scene_im_ids"]
        n_real = int(np.sum(a["valid"]))
        assert n_real > 0
        # padding rows (trailing partial group) carry valid=False; only the
        # real rows must match
        v = np.asarray(a["valid"])
        np.testing.assert_allclose(np.asarray(b["pcl"])[v], a["pcl"][v], atol=0)
        np.testing.assert_array_equal(a["valid"], b["valid"])
        np.testing.assert_allclose(a["obj_pose_est"], b["obj_pose_est"], atol=0)


def test_repeat_factor_sampler(fake_real_root):  # noqa: F811
    """RepeatFactorTrainingSampler (`my_distributed_sampler.py:172-200`):
    rare-category images recur ~sqrt(t/f) x more often; skip() determinism
    holds across variable-length epochs."""
    from catre_tpu.data.loader import repeat_factors_from_category_frequency

    # 8 images of category 0, 2 of category 5 (rare: f=0.2)
    dicts = []
    for i in range(10):
        cat = 5 if i >= 8 else 0
        dicts.append({"id": i, "annotations": [{"category_id": cat}]})
    rf = repeat_factors_from_category_frequency(dicts, repeat_thresh=0.8)
    np.testing.assert_allclose(rf[:8], 1.0)  # f=0.8 >= t -> no repeat
    np.testing.assert_allclose(rf[8:], 2.0)  # sqrt(0.8/0.2) = 2

    cfg = LoaderConfig(num_pcl=16, max_objs_per_image=1,
                       sampler_train="RepeatFactorTrainingSampler",
                       repeat_threshold=0.8)
    loader = CATRELoader(dicts, cfg, phase="train", ims_per_batch=1, seed=2)
    ids = [didx for _, didx, _ in
           (next(loader._train_records()) for _ in range(120))]
    counts = np.bincount(ids, minlength=10)
    # rare images sampled ~2x as often as common ones in expectation
    assert counts[8:].mean() > 1.5 * counts[:8].mean()
    # epochs are exactly 12 long here (integral factors): 8*1 + 2*2
    assert loader._epoch_cum[1] == 12

    # position addressing is stable across a skip
    l2 = CATRELoader(dicts, cfg, phase="train", ims_per_batch=1, seed=2)
    l2.skip(50)
    tail = [didx for _, didx, _ in (next(l2._train_records()) for _ in range(30))]
    assert tail == ids[50:80]


@pytest.mark.parametrize("cache", ["", "device"])
def test_windowed_loader_matches_full_field(fake_real_root, cache):  # noqa: F811
    """sample_window through the loader (the fused from-depth path, incl.
    the host-precomputed mask_bbox threading and the device-cache stacks):
    with num_pcl > the instance's candidate count, the sampled point SET
    equals the window=0 full-field loader's (every mask∧depth>0 pixel is
    selected in both, selection order differs only by RNG stream)."""
    dicts = _test_dicts(fake_real_root)
    mk = lambda window: CATRELoader(
        dicts, LoaderConfig(num_pcl=4096, max_objs_per_image=2,
                            aug_depth=False, sample_window=window,
                            cache_decoded=cache),
        phase="test", ims_per_batch=1, seed=5)
    # -1 resolves to the smallest exactness-preserving multiple of 32
    # covering the split's 50 px bboxes
    auto = mk(-1)
    assert auto.cfg.sample_window == 64
    full = _batches(mk(0))
    win = _batches(auto)
    assert len(full) == len(win) == 2
    checked = 0
    for a, b in zip(full, win):
        assert a["scene_im_ids"] == b["scene_im_ids"]
        np.testing.assert_array_equal(a["valid"], b["valid"])
        pa, pb = np.asarray(a["pcl"]), np.asarray(b["pcl"])
        for ia in np.flatnonzero(np.asarray(a["valid"])):
            ua = np.unique(pa[ia], axis=0)
            ub = np.unique(pb[ia], axis=0)
            assert ua.shape == ub.shape and ua.shape[0] > 100
            np.testing.assert_array_equal(ua, ub)
            checked += 1
    assert checked == 2


@pytest.mark.parametrize("cache", ["", "device"])
def test_reset_stream_reiterates_identically(fake_real_root, cache):  # noqa: F811
    """reset_stream() rewinds a finished test loader for the next periodic
    eval (runner caches the loader to keep the RAM/HBM decoded caches warm);
    positional keys make every pass draw the identical stream."""
    dicts = _test_dicts(fake_real_root)
    ld = CATRELoader(
        dicts, LoaderConfig(num_pcl=128, max_objs_per_image=2,
                            aug_depth=False, cache_decoded=cache),
        phase="test", ims_per_batch=1, seed=5)
    first = _batches(ld)
    assert _batches(ld) == []  # exhausted without a rewind
    ld.reset_stream()
    second = _batches(ld)
    assert len(first) == len(second) == 2
    for a, b in zip(first, second):
        assert a["scene_im_ids"] == b["scene_im_ids"]
        np.testing.assert_array_equal(np.asarray(a["pcl"]), np.asarray(b["pcl"]))
        np.testing.assert_allclose(a["obj_pose_est"], b["obj_pose_est"], atol=0)


def test_auto_sample_window_resolution():
    from catre_tpu.data.loader import auto_sample_window

    dicts = [{"annotations": [{"bbox": [10, 10, 70, 50]},
                              {"bbox": [0, 0, 40, 130.5]}]},
             {"annotations": [{"bbox_est": [5, 5, 200, 60],
                               "bbox": [0, 0, 10, 10]}]}]
    # train: gt bboxes -> max extent 130.5 -> ceil(132.5/32)*32 = 160
    assert auto_sample_window(dicts, "train") == 160
    # test: bbox_est preferred -> max extent 195 -> 224
    assert auto_sample_window(dicts, "test") == 224
    # unusable bbox anywhere -> full frame
    assert auto_sample_window([{"annotations": [{}]}], "train") == 0
    assert auto_sample_window([], "train") == 0
