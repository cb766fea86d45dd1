"""Frozen eval batches (round-5 host-path cut): the device-cache +
device-batches test path builds its host side once and replays it — batches
must be BIT-IDENTICAL to the unfrozen path, across passes, and through
run_inference scoring."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data import loader as loader_mod
from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset

from test_data_pipeline import fake_real_root  # noqa: F401  (fixture)


@pytest.fixture(autouse=True)
def _fresh_registry():
    loader_mod._DECODED_CACHE_REGISTRY.clear()
    yield
    loader_mod._DECODED_CACHE_REGISTRY.clear()


def _dicts(fake_real_root):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    for rec in dicts:
        for anno in rec["annotations"]:
            anno["pose_est"] = anno["pose"]
            anno["scale_est"] = anno["scale"] * 1.05
            anno["score"] = 0.9
    return dicts


def _mk(dicts, ims=2, seed=3):
    cfg = LoaderConfig(num_pcl=128, max_objs_per_image=2, aug_depth=False,
                       cache_decoded="device")
    return CATRELoader(dicts, cfg, phase="test", ims_per_batch=ims, seed=seed,
                       device_batches=True)


def _materialize(batches):
    out = []
    for b in batches:
        d = {k: np.asarray(v) for k, v in b.items()
             if isinstance(v, np.ndarray) or hasattr(v, "shape")}
        d["scene_im_ids"] = list(b["scene_im_ids"])
        out.append(d)
    return out


def test_frozen_matches_unfrozen_bitexact(fake_real_root, monkeypatch):  # noqa: F811
    dicts = _dicts(fake_real_root)
    frozen = _mk(dicts)
    assert frozen._frozen_eligible()
    got_f = _materialize(list(frozen))
    assert len(frozen._plan_store) == 1  # plan built

    monkeypatch.setenv("CATRE_DISABLE_FROZEN_EVAL", "1")
    plain = _mk(dicts, seed=3)
    assert not plain._frozen_eligible()
    got_p = _materialize(list(plain))
    assert len(got_f) == len(got_p) > 0
    for f, p in zip(got_f, got_p):
        assert f["scene_im_ids"] == p["scene_im_ids"]
        for k in p:
            if k == "scene_im_ids":
                continue
            np.testing.assert_array_equal(f[k], p[k], err_msg=k)


def test_frozen_replay_identical_and_seed_dependent(fake_real_root):  # noqa: F811
    dicts = _dicts(fake_real_root)
    loader = _mk(dicts)
    p1 = _materialize(list(loader))
    loader.reset_stream()
    p2 = _materialize(list(loader))
    for a, b in zip(p1, p2):
        for k in a:
            if k != "scene_im_ids":
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # a different sampler seed adopts the same plan but draws different clouds
    other = _mk(dicts, seed=99)
    assert other._plan_store is loader._plan_store
    p3 = _materialize(list(other))
    assert any(not np.array_equal(a["pcl"], b["pcl"]) for a, b in zip(p1, p3))
    # ... while every frozen host field is shared/identical
    for a, b in zip(p1, p3):
        np.testing.assert_array_equal(a["obj_pose_est"], b["obj_pose_est"])


def test_frozen_through_run_inference(fake_real_root):  # noqa: F811
    import jax

    from catre_tpu.engine.refiner import make_refine_fn
    from catre_tpu.eval.evaluator import CATREEvaluator, run_inference
    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

    dicts = _dicts(fake_real_root)
    loader = _mk(dicts)
    cfg = CATREConfig(num_pcl=128, num_kps=8)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    def run_pass():
        loader.reset_stream()
        ev = CATREEvaluator(dicts, n_iters=1, output_dir=None)
        run_inference(refine, params, iter(loader), ev, n_iters=1, warmup=0,
                      kps_type="bbox", num_kps=8, compute_probe_every=0)
        return ev.evaluate(dump=False)

    r1 = run_pass()
    # finish_fields memo is populated and the second pass scores identically
    plan = next(iter(loader._plan_store.values()))
    assert all("finish_fields" in grp["memo"] for grp in plan)
    r2 = run_pass()
    assert r1[1]["summary"] == r2[1]["summary"]
    assert np.isfinite(list(r1[1]["summary"].values())).all()


def test_presampled_matches_per_pass_sampler_bitexact(fake_real_root, monkeypatch):  # noqa: F811
    """The presampled-candidates fast path (deterministic ball-crop half
    cached once, randomized selection replayed per pass) yields batches
    BIT-IDENTICAL to the per-pass cached sampler, across seeds. Requires a
    windowed config (the presampled path mirrors the fused windowed crop)."""
    dicts = _dicts(fake_real_root)

    def _mk_windowed(seed):
        cfg = LoaderConfig(num_pcl=128, max_objs_per_image=2, aug_depth=False,
                           cache_decoded="device", sample_window=32)
        return CATRELoader(dicts, cfg, phase="test", ims_per_batch=2,
                           seed=seed, device_batches=True)

    for seed in (3, 9):
        monkeypatch.delenv("CATRE_DISABLE_PRESAMPLED_EVAL", raising=False)
        fast_loader = _mk_windowed(seed)
        assert fast_loader._frozen_eligible()
        assert fast_loader._ensure_candidates() is not None
        got_fast = _materialize(list(fast_loader))
        assert len(fast_loader._cand_store) == 1  # one cached entry

        monkeypatch.setenv("CATRE_DISABLE_PRESAMPLED_EVAL", "1")
        loader_mod._DECODED_CACHE_REGISTRY.clear()
        ref_loader = _mk_windowed(seed)
        assert ref_loader._ensure_candidates() is None
        got_ref = _materialize(list(ref_loader))
        loader_mod._DECODED_CACHE_REGISTRY.clear()

        assert len(got_fast) == len(got_ref) > 0
        for f, p in zip(got_fast, got_ref):
            assert f["scene_im_ids"] == p["scene_im_ids"]
            for k in p:
                if k == "scene_im_ids":
                    continue
                np.testing.assert_array_equal(f[k], p[k], err_msg=k)


def test_deferred_selection_bitexact_through_run_inference(fake_real_root, monkeypatch):  # noqa: F811
    """defer_selection=True ships candidate refs instead of a sampled pcl and
    run_inference fuses selection + refine into one dispatch — predictions
    must be bit-identical to the split sampler-then-refine path (same ops,
    same key stream; the selection is a pure gather)."""
    import jax

    from catre_tpu.data import assets
    from catre_tpu.engine.refiner import make_refine_fn
    from catre_tpu.eval.evaluator import CATREEvaluator, run_inference
    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

    # small mean-shape table so the packed mean-table path activates at
    # num_kps=8 (the real asset is 1024-kps)
    table = np.random.RandomState(0).randn(6, 8, 3).astype(np.float32)
    monkeypatch.setattr(assets, "mean_shape_array", lambda: table)

    dicts = _dicts(fake_real_root)
    lcfg = LoaderConfig(num_pcl=128, max_objs_per_image=2, aug_depth=False,
                        cache_decoded="device", sample_window=32)

    def mk(defer):
        return CATRELoader(dicts, lcfg, phase="test", ims_per_batch=2,
                           seed=3, device_batches=True, defer_selection=defer)

    cfg = CATREConfig(num_pcl=128, num_kps=8)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    def run(defer):
        loader = mk(defer)
        if defer:  # deferred batches really are deferred (no pcl shipped)
            b0 = next(iter(loader))
            assert "_presampled" in b0 and "pcl" not in b0
        ev = CATREEvaluator(dicts, n_iters=1, output_dir=None)
        run_inference(refine, params, iter(loader), ev, n_iters=1, warmup=0,
                      kps_type="mean_shape", num_kps=8, compute_probe_every=0)
        return ev._preds

    p_split = run(False)
    p_fused = run(True)
    n = 0
    for d_s, d_f in zip(p_split, p_fused):
        assert d_s.keys() == d_f.keys()
        for sid in d_s:
            for k in d_s[sid]:
                np.testing.assert_array_equal(d_s[sid][k], d_f[sid][k],
                                              err_msg=f"{sid}:{k}")
                n += 1
    assert n > 0

    # presampled path inactive -> defer_selection falls back to normal
    # frozen batches (pcl shipped, no _presampled)
    monkeypatch.setenv("CATRE_PRESAMPLED_MAX_GB", "0")
    loader_mod._DECODED_CACHE_REGISTRY.clear()
    fb = next(iter(mk(True)))
    assert "pcl" in fb and "_presampled" not in fb


def test_replay_pcl_diagnostic(fake_real_root, monkeypatch):  # noqa: F811
    """CATRE_FROZEN_REPLAY_PCL stashes each group's sampled clouds and
    replays them on later passes (diagnostic: isolates the refine-only
    in-situ wall). Replayed batches are identical to freshly sampled ones."""
    dicts = _dicts(fake_real_root)
    loader = _mk(dicts)
    p_fresh = _materialize(list(loader))
    monkeypatch.setenv("CATRE_FROZEN_REPLAY_PCL", "1")
    loader.reset_stream()
    p_stash = _materialize(list(loader))  # stashing pass (samples + stashes)
    loader.reset_stream()
    p_replay = _materialize(list(loader))  # replayed from the stash
    plan = next(iter(loader._plan_store.values()))
    assert all(loader.seed in grp.get("pcl_replay", {}) for grp in plan)
    for a, b, c in zip(p_fresh, p_stash, p_replay):
        np.testing.assert_array_equal(a["pcl"], b["pcl"])
        np.testing.assert_array_equal(a["pcl"], c["pcl"])


def test_presampled_size_guard(fake_real_root, monkeypatch):  # noqa: F811
    """A candidate stack over CATRE_PRESAMPLED_MAX_GB falls back to the
    per-pass sampler (and caches the decision) instead of allocating."""
    dicts = _dicts(fake_real_root)
    cfg = LoaderConfig(num_pcl=128, max_objs_per_image=2, aug_depth=False,
                       cache_decoded="device", sample_window=32)
    loader = CATRELoader(dicts, cfg, phase="test", ims_per_batch=2,
                         device_batches=True)
    monkeypatch.setenv("CATRE_PRESAMPLED_MAX_GB", "0")
    assert loader._ensure_candidates() is None
    assert False in loader._cand_store.values()
    # batches still come out (per-pass sampler path)
    assert len(_materialize(list(loader))) > 0
