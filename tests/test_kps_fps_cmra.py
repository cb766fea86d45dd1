"""KPS_TYPE="fps" end-to-end wiring + INPUT.USE_CMRA_MODEL per-instance
priors (VERDICT r4 items 3-4).

Reference behavior: `core/catre/datasets/data_loader.py:623-650` (train fps
shipping), `:737-752` (test fps, the gt-model ablation), `:633-637`
(USE_CMRA_MODEL per-instance prior points), and
`core/catre/engine/engine_utils.py:27-40` (norm_fps_points by the iteration-1
scale estimate).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from catre_tpu.data import assets
from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset

from test_data_pipeline import fake_real_root  # noqa: F401  (fixture)

INST = "bottle_red_stanford_norm"
NUM_KPS = 8


@pytest.fixture(autouse=True)
def _fresh_registry():
    from catre_tpu.data import loader as loader_mod

    loader_mod._DECODED_CACHE_REGISTRY.clear()
    yield
    loader_mod._DECODED_CACHE_REGISTRY.clear()


@pytest.fixture()
def fps_asset(monkeypatch):
    """Reference-format fps pickle entry for the fixture's one instance."""
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(NUM_KPS + 1, 3)).astype(np.float32) * 0.3
    monkeypatch.setattr(assets, "load_fps_points",
                        lambda path=None: {INST: {f"fps{NUM_KPS}_and_center": pts}})
    return pts[:-1]  # the consumed view (center row dropped)


def _dicts(fake_real_root, with_est=True, dataset_name=None):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    for rec in dicts:
        if dataset_name is not None:
            rec["dataset_name"] = dataset_name
        for anno in rec["annotations"]:
            if with_est:
                anno["pose_est"] = anno["pose"]
                anno["scale_est"] = anno["scale"] * 1.1
                anno["score"] = 0.9
    return dicts


def test_fps_asset_format_normalization(fps_asset):
    got = assets.get_fps_points(INST, NUM_KPS)
    np.testing.assert_array_equal(got, fps_asset)
    with_center = assets.get_fps_points(INST, NUM_KPS, with_center=True)
    assert with_center.shape == (NUM_KPS + 1, 3)
    # flat format (tools/fps_sample.py legacy layout) also accepted
    flat = {INST: fps_asset}
    import catre_tpu.data.assets as assets_mod

    orig = assets_mod.load_fps_points
    assets_mod.load_fps_points = lambda path=None: flat
    try:
        np.testing.assert_array_equal(
            assets_mod.get_fps_points(INST, NUM_KPS), fps_asset)
    finally:
        assets_mod.load_fps_points = orig


def _mk_loader(dicts, phase, ims_per_batch=1, **cfg_kw):
    # ship_mean_points=False mirrors config.build.loader_config_from's fps
    # wiring (mean points are unused by the fps kps path)
    kw = dict(num_pcl=64, max_objs_per_image=2, aug_depth=False,
              kps_type="fps", num_kps=NUM_KPS, ship_mean_points=False)
    kw.update(cfg_kw)
    return CATRELoader(dicts, LoaderConfig(**kw), phase=phase,
                       ims_per_batch=ims_per_batch)


def test_fps_loader_ships_points(fake_real_root, fps_asset):  # noqa: F811
    dicts = _dicts(fake_real_root)
    batches = [b for b in _mk_loader(dicts, "test") if not b.get("empty")]
    assert len(batches) == 2
    for b in batches:
        assert b["obj_fps_points"].shape == (2, NUM_KPS, 3)
        valid = b["valid"]
        np.testing.assert_array_equal(b["obj_fps_points"][valid][0], fps_asset)
        # padded rows carry zeros
        np.testing.assert_array_equal(b["obj_fps_points"][~valid], 0.0)
        # fps configs don't ship mean points (unused by the fps kps path)
        assert "obj_mean_points" not in b


def test_fps_missing_inst_name_fails_loudly(fake_real_root, fps_asset):  # noqa: F811
    dicts = _dicts(fake_real_root)
    for rec in dicts:
        for anno in rec["annotations"]:
            anno.pop("inst_name", None)
    with pytest.raises(KeyError, match="inst_name"):
        list(_mk_loader(dicts, "test"))


def test_fps_eval_normalizes_by_init_scale(fake_real_root, fps_asset):  # noqa: F811
    """run_inference's fps path feeds refine obj_kps = fps / scale_est
    (norm_fps_points, engine_utils.py:39-40; test uses the INIT estimate)."""
    from catre_tpu.eval.evaluator import CATREEvaluator, run_inference

    dicts = _dicts(fake_real_root)
    loader = _mk_loader(dicts, "test")
    evaluator = CATREEvaluator(dicts, n_iters=1, output_dir=None)
    seen = {}

    def stub_refine(params, pcl, obj_kps, pose_est, scale_est, K, mean_scales):
        seen["obj_kps"] = np.asarray(obj_kps)
        seen["scale_est"] = np.asarray(scale_est)
        b = pose_est.shape[0]
        poses = jnp.tile(pose_est[None], (2, 1, 1, 1))
        scales = jnp.tile(scale_est[None], (2, 1, 1))
        return poses, scales

    run_inference(stub_refine, {}, iter(loader), evaluator, n_iters=1,
                  warmup=0, kps_type="fps", num_kps=NUM_KPS,
                  compute_probe_every=0)
    expected = np.zeros_like(seen["obj_kps"])
    # row 0 of each image is the real instance; padded rows are zeros/0.1
    np.testing.assert_allclose(
        seen["obj_kps"], np.stack([
            fps_asset / s[None, :] if np.any(k) else k
            for k, s in zip(
                np.concatenate([np.stack([fps_asset, np.zeros_like(fps_asset)])] * 1),
                seen["scale_est"][:2])
        ] + [np.zeros_like(fps_asset)] * (len(seen["obj_kps"]) - 2)), rtol=1e-6)
    res = evaluator.evaluate(dump=False)
    assert np.isfinite(list(res[1]["summary"].values())).all()


def test_fps_trains_end_to_end(fake_real_root, fps_asset):  # noqa: F811
    """Loader -> _batch_to_device -> train step with KPS_TYPE='fps' runs and
    produces finite losses (the round-4 gap: select_kps used to assert)."""
    from catre_tpu.engine.runner import _batch_to_device
    from catre_tpu.engine.train import InputNoiseConfig, TrainState, make_train_step
    from catre_tpu.geom import axis_symmetry_rotation_bank
    from catre_tpu.losses import LossConfig
    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
    from catre_tpu.solver import build_optimizer

    dicts = _dicts(fake_real_root, with_est=False)
    loader = _mk_loader(dicts, "train", ims_per_batch=2)
    batch_np = next(iter(loader))
    batch = _batch_to_device(batch_np, kps_type="fps", num_kps=NUM_KPS)
    assert "obj_kps" not in batch  # normalized inside the step
    assert batch["obj_fps_points"].shape[1:] == (NUM_KPS, 3)

    cfg = CATREConfig(num_pcl=64, num_kps=NUM_KPS)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-4}})
    state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
    step = make_train_step(model, cfg, LossConfig(),
                           InputNoiseConfig(bbox3d_aug_prob=0.0, rt_aug_prob=0.0),
                           tx, axis_symmetry_rotation_bank(max_sym_disc_step=0.1),
                           n_iter=2)
    state, metrics = step(state, batch, jax.random.PRNGKey(3), 1e-4)
    assert np.isfinite(float(jnp.mean(metrics["loss_total"])))


def test_use_cmra_model_per_instance_prior(fake_real_root, monkeypatch):  # noqa: F811
    """cmra records get PER-INSTANCE model points as obj_mean_points
    (data_loader.py:633-637); non-cmra and USE_CMRA_MODEL=False keep the
    category mean; missing instances fall back to the category mean."""
    rng = np.random.default_rng(5)
    cat_table = assets.mean_shape_array()
    inst_pts = rng.normal(size=cat_table.shape[1:]).astype(np.float32)
    shapes = {k: cat_table[i] for i, k in enumerate(
        __import__("catre_tpu.data.meta", fromlist=["OBJECTS"]).OBJECTS)}
    shapes[INST] = inst_pts
    monkeypatch.setattr(assets, "load_mean_shapes", lambda path=None: shapes)

    def batches(dicts, **kw):
        cfg = dict(num_pcl=64, max_objs_per_image=2, aug_depth=False,
                   ship_mean_points=True)
        cfg.update(kw)
        loader = CATRELoader(dicts, LoaderConfig(**cfg), phase="test",
                             ims_per_batch=1)
        return [b for b in loader if not b.get("empty")]

    # cmra + USE_CMRA_MODEL (default True): instance points flow through
    cmra = batches(_dicts(fake_real_root, dataset_name="nocs_train_cmra"))
    np.testing.assert_array_equal(cmra[0]["obj_mean_points"][0], inst_pts)
    # non-cmra dataset: category mean (bottle = category 0)
    real = batches(_dicts(fake_real_root))
    np.testing.assert_array_equal(real[0]["obj_mean_points"][0], cat_table[0])
    # USE_CMRA_MODEL=False: category mean even on cmra
    off = batches(_dicts(fake_real_root, dataset_name="nocs_train_cmra"),
                  use_cmra_model=False)
    np.testing.assert_array_equal(off[0]["obj_mean_points"][0], cat_table[0])
    # missing instance: warn-once fallback to the category mean
    shapes.pop(INST)
    missing = batches(_dicts(fake_real_root, dataset_name="nocs_train_cmra"))
    np.testing.assert_array_equal(missing[0]["obj_mean_points"][0], cat_table[0])


def test_use_cmra_model_survives_ram_cache(fake_real_root, monkeypatch):  # noqa: F811
    """Per-instance priors must be STORED in the decoded cache, not clobbered
    by the hit path's category-mean recompute."""
    rng = np.random.default_rng(6)
    cat_table = assets.mean_shape_array()
    inst_pts = rng.normal(size=cat_table.shape[1:]).astype(np.float32)
    from catre_tpu.data import meta

    shapes = {k: cat_table[i] for i, k in enumerate(meta.OBJECTS)}
    shapes[INST] = inst_pts
    monkeypatch.setattr(assets, "load_mean_shapes", lambda path=None: shapes)

    dicts = _dicts(fake_real_root, dataset_name="nocs_train_cmra")
    cfg = LoaderConfig(num_pcl=64, max_objs_per_image=2, aug_depth=False,
                       ship_mean_points=True, cache_decoded="ram")
    loader = CATRELoader(dicts, cfg, phase="test", ims_per_batch=1)
    first = [b for b in loader if not b.get("empty")]
    loader.reset_stream()
    second = [b for b in loader if not b.get("empty")]  # cache-hit pass
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a["obj_mean_points"], b["obj_mean_points"])
    np.testing.assert_array_equal(second[0]["obj_mean_points"][0], inst_pts)
