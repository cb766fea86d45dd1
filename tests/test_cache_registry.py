"""Shared decoded-cache registry + gated mean-points shipping (round-4
eval-loader host-path cuts): sharing must be keyed on dataset identity AND
every cfg field the decoded tensors depend on, never go stale, stay bounded,
and leave batch content bit-identical to a private-cache loader."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data import loader as loader_mod
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


def _batches(loader):
    return [b for b in loader if not b.get("empty")]


def _mk(dicts, cache="ram", seed=5, **cfg_kw):
    kw = dict(num_pcl=128, max_objs_per_image=2, aug_depth=False,
              cache_decoded=cache)
    kw.update(cfg_kw)
    return CATRELoader(dicts, LoaderConfig(**kw), phase="test",
                       ims_per_batch=1, seed=seed)


@pytest.fixture(autouse=True)
def _fresh_registry():
    loader_mod._DECODED_CACHE_REGISTRY.clear()
    yield
    loader_mod._DECODED_CACHE_REGISTRY.clear()


def test_registry_shares_ram_cache_and_matches_private(fake_real_root,
                                                       monkeypatch):  # noqa: F811
    dicts = _test_dicts(fake_real_root)
    a = _mk(dicts)
    got_a = _batches(a)
    b = _mk(dicts)
    # the second instance adopts the SAME cache dict (no rebuild) ...
    assert b._ram_cache is a._ram_cache
    assert len(a._ram_cache) > 0  # pass 1 actually populated it
    got_b = _batches(b)
    # ... and an opt-out (private-cache) loader yields bit-identical batches
    monkeypatch.setenv("CATRE_SHARE_DECODED_CACHE", "0")
    c = _mk(dicts)
    assert c._ram_cache is not a._ram_cache
    got_c = _batches(c)
    assert len(got_a) == len(got_b) == len(got_c) == 2
    for x, y in zip(got_b, got_c):
        assert x["scene_im_ids"] == y["scene_im_ids"]
        np.testing.assert_array_equal(np.asarray(x["pcl"]), np.asarray(y["pcl"]))
        np.testing.assert_array_equal(x["obj_pose_est"], y["obj_pose_est"])


def test_registry_shares_device_cache(fake_real_root):  # noqa: F811
    dicts = _test_dicts(fake_real_root)
    a = _mk(dicts, cache="device")
    b = _mk(dicts, cache="device")
    assert b._dev is a._dev  # HBM stacks reused, not re-uploaded
    assert b._dev_row == a._dev_row
    for x, y in zip(_batches(a), _batches(b)):
        np.testing.assert_array_equal(np.asarray(x["pcl"]), np.asarray(y["pcl"]))


def test_registry_isolates_cfg_and_dataset(fake_real_root):  # noqa: F811
    dicts = _test_dicts(fake_real_root)
    a = _mk(dicts)
    # a decoded-tensor-relevant cfg change must NOT hit a's cache
    b = _mk(dicts, max_objs_per_image=4)
    assert b._ram_cache is not a._ram_cache
    # same content, different list object = different dataset identity
    other = [dict(r) for r in dicts]
    c = _mk(other)
    assert c._ram_cache is not a._ram_cache


def test_registry_stale_identity_evicted(fake_real_root):  # noqa: F811
    """A registry entry whose pinned dicts is not the constructor's dicts
    (recycled id / tampering) must be evicted, never reused."""
    dicts = _test_dicts(fake_real_root)
    a = _mk(dicts)
    _batches(a)
    (ck, entry), = loader_mod._DECODED_CACHE_REGISTRY.items()
    entry["dicts"] = [dict(r) for r in dicts]  # simulate a recycled id
    b = _mk(dicts)
    assert b._ram_cache is not entry["ram"]
    assert loader_mod._DECODED_CACHE_REGISTRY[ck]["dicts"] is dicts


def test_registry_isolates_mask_bbox_wanting_cfgs(fake_real_root):  # noqa: F811
    """fps_sample flips `_wants_mask_bbox` (real bounds vs empty sentinel in
    the decoded tensors) without changing any field the old key carried — the
    two loaders must NOT share an entry, or the fused-window loader would
    adopt sentinel bounds and silently crop every instance as empty."""
    dicts = _test_dicts(fake_real_root)
    a = _mk(dicts, sample_window=64)            # fused-window: real bounds
    assert loader_mod._wants_mask_bbox(a.cfg, "test")
    b = _mk(dicts, sample_window=64, fps_sample=True)  # sentinel bounds
    assert not loader_mod._wants_mask_bbox(b.cfg, "test")
    assert b._ram_cache is not a._ram_cache
    got_a = _batches(a)
    # the fused loader's cached mask_bbox rows are real bounds (not sentinel)
    entry = a._ram_cache[next(iter(a._ram_cache))]
    assert (entry["mask_bbox"][:, 1] >= 0).any()
    assert len(got_a) == 2


def test_clear_decoded_caches(fake_real_root):  # noqa: F811
    dicts = _test_dicts(fake_real_root)
    _mk(dicts)
    assert len(loader_mod._DECODED_CACHE_REGISTRY) == 1
    loader_mod.clear_decoded_caches()
    assert len(loader_mod._DECODED_CACHE_REGISTRY) == 0


def test_registry_bounded(fake_real_root):  # noqa: F811
    dicts = _test_dicts(fake_real_root)
    for m in range(2, 2 + loader_mod._DECODED_CACHE_MAX + 2):
        _mk(dicts, max_objs_per_image=m)
    assert len(loader_mod._DECODED_CACHE_REGISTRY) <= loader_mod._DECODED_CACHE_MAX


def test_ship_mean_points_gate(fake_real_root):  # noqa: F811
    """ship_mean_points=False drops the (M,1024,3) gather + concat the
    device-kps-table eval path never reads; everything else is unchanged."""
    dicts = _test_dicts(fake_real_root)
    with_mp = _batches(_mk(dicts))
    without = _batches(_mk(dicts, ship_mean_points=False))
    assert all("obj_mean_points" in b for b in with_mp)
    assert all("obj_mean_points" not in b for b in without)
    for x, y in zip(with_mp, without):
        assert x["scene_im_ids"] == y["scene_im_ids"]
        np.testing.assert_array_equal(np.asarray(x["pcl"]), np.asarray(y["pcl"]))
        np.testing.assert_array_equal(x["obj_cls"], y["obj_cls"])
