"""Integration test of the test-time path: loader -> jitted refine ->
evaluator -> NOCS metric tables, on the synthetic on-disk dataset.

Mirrors the reference's de-facto integration test: the gt_noise validation
mode (SURVEY.md §4.3) where the refiner is isolated from the detector.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.data.nocs import NOCSDataset
from catre_tpu.engine.refiner import make_refine_fn
from catre_tpu.eval import CATREEvaluator, run_inference
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

from test_data_pipeline import fake_real_root  # noqa: F401  (fixture)


def _dicts_with_init(fake_real_root, noise=0.0):
    ds = NOCSDataset("nocs_test_real", image_root=fake_real_root, use_cache=False)
    dicts = ds()
    rng = np.random.default_rng(0)
    for rec in dicts:
        for anno in rec["annotations"]:
            pose = anno["pose"].copy()
            pose[:, 3] += rng.normal(0, noise, 3)
            anno["pose_est"] = pose
            anno["scale_est"] = anno["scale"].copy()
            anno["score"] = 1.0
    return dicts


def test_gt_init_scores_perfect(fake_real_root):  # noqa: F811
    """iter0 = exact gt init => all metrics 100 (validates gt assembly,
    pose conventions, IoU and matching end-to-end)."""
    dicts = _dicts_with_init(fake_real_root, noise=0.0)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    loader = CATRELoader(dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4,
                                             aug_depth=False), phase="test", ims_per_batch=1)
    evaluator = CATREEvaluator(dicts, n_iters=1)
    stats = run_inference(refine, params, iter(loader), evaluator, n_iters=1, warmup=0)
    assert stats["images"] == 2
    results = evaluator.evaluate(dump=False)
    # only the bottle class (index 1) has gt in the fixture; the class-mean
    # dilutes by the 5 absent classes, so check the per-class APs directly
    iou_aps, pose_aps = results[0]["iou_aps"], results[0]["pose_aps"]
    for s in range(4):
        assert iou_aps[1, s] == pytest.approx(1.0), iou_aps
    assert pose_aps[1, 0, 0] == pytest.approx(1.0)  # 5d2cm
    assert pose_aps[1, -1, 0] == pytest.approx(1.0)  # te2
    # untrained model at iter1: metrics exist and are finite
    s1 = results[1]["summary"]
    assert all(np.isfinite(v) for v in s1.values())


def test_batched_test_images_match_per_image(fake_real_root):  # noqa: F811
    """ims_per_batch=2 (both fixture images in ONE jit call) must give the
    same evaluator input as per-image evaluation."""
    dicts = _dicts_with_init(fake_real_root, noise=0.0)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    results = {}
    for ipb in (1, 2):
        loader = CATRELoader(
            dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4, aug_depth=False),
            phase="test", ims_per_batch=ipb, seed=0,
        )
        evaluator = CATREEvaluator(dicts, n_iters=1)
        run_inference(refine, params, iter(loader), evaluator, n_iters=1, warmup=0)
        results[ipb] = evaluator.evaluate(dump=False)
    np.testing.assert_allclose(
        results[1][1]["pose_aps"], results[2][1]["pose_aps"], atol=1e-9
    )
    np.testing.assert_allclose(
        results[1][0]["iou_aps"], results[2][0]["iou_aps"], atol=1e-9
    )


def test_packed_inputs_match_unpacked(fake_real_root):  # noqa: F811
    """The packed single-upload path (pose/scale/K/mean_scales/cls in one
    (B, 28) f32 array, kps gathered inside the jitted program) must produce
    bit-identical predictions to the multi-put path it replaces."""
    dicts = _dicts_with_init(fake_real_root, noise=0.05)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=2)

    preds = {}
    for packed in (False, True):
        loader = CATRELoader(
            dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4, aug_depth=False),
            phase="test", ims_per_batch=2, seed=0,
        )
        evaluator = CATREEvaluator(dicts, n_iters=2)
        run_inference(refine, params, iter(loader), evaluator, n_iters=2,
                      warmup=0, packed_inputs=packed)
        preds[packed] = evaluator._preds
    assert len(preds[True]) == len(preds[False]) == 3  # iters 0..2
    for it in range(3):
        assert sorted(preds[True][it]) == sorted(preds[False][it])
        assert preds[True][it], "no predictions recorded"
        for key in preds[True][it]:
            pt, pf = preds[True][it][key], preds[False][it][key]
            np.testing.assert_array_equal(pt["pred_RTs"], pf["pred_RTs"])
            np.testing.assert_array_equal(pt["pred_scales"], pf["pred_scales"])


def test_noisy_init_scores_degrade(fake_real_root):  # noqa: F811
    """iter0 with 10cm translation noise must not be perfect at te2."""
    dicts = _dicts_with_init(fake_real_root, noise=0.10)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    loader = CATRELoader(dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4,
                                             aug_depth=False), phase="test", ims_per_batch=1)
    evaluator = CATREEvaluator(dicts, n_iters=1)
    run_inference(refine, params, iter(loader), evaluator, n_iters=1, warmup=0)
    results = evaluator.evaluate(dump=False)
    assert results[0]["pose_aps"][1, -1, 0] < 1.0  # bottle te2 not perfect


def test_final_partial_group_is_padded(fake_real_root):  # noqa: F811
    """ims_per_batch=4 with only 2 fixture images: the single (partial) group
    is padded to the full static shape (one compile) and padding images are
    skipped -- scores equal the per-image run."""
    dicts = _dicts_with_init(fake_real_root, noise=0.0)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    results = {}
    shapes = {}
    for ipb in (1, 4):
        loader = CATRELoader(
            dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4, aug_depth=False),
            phase="test", ims_per_batch=ipb, seed=0,
        )
        batches = [b for b in iter(loader) if not b.get("empty")]
        shapes[ipb] = {b["pcl"].shape for b in batches}
        evaluator = CATREEvaluator(dicts, n_iters=1)
        run_inference(refine, params, iter(batches), evaluator, n_iters=1, warmup=0)
        results[ipb] = evaluator.evaluate(dump=False)
    # padded run: ONE batch of the full static shape (4 images x 4 objs)
    assert shapes[4] == {(16, 128, 3)}
    np.testing.assert_allclose(results[1][1]["pose_aps"], results[4][1]["pose_aps"], atol=1e-9)
    np.testing.assert_allclose(results[1][0]["iou_aps"], results[4][0]["iou_aps"], atol=1e-9)


def test_mesh_eval_matches_single_device(fake_real_root):  # noqa: F811
    """run_inference with an 8-device mesh (rows sharded) must reproduce the
    single-device scores exactly (VERDICT r1 weak #1)."""
    from catre_tpu.parallel import make_mesh

    dicts = _dicts_with_init(fake_real_root, noise=0.02)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=2)

    results = {}
    for mesh in (None, make_mesh(8)):
        loader = CATRELoader(
            dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4, aug_depth=False),
            phase="test", ims_per_batch=2, seed=0,  # 8 rows -> divisible by 8
        )
        evaluator = CATREEvaluator(dicts, n_iters=2)
        run_inference(refine, params, iter(loader), evaluator, n_iters=2,
                      warmup=0, mesh=mesh)
        results["mesh" if mesh is not None else "single"] = evaluator.evaluate(dump=False)
    for it in (0, 1, 2):
        np.testing.assert_allclose(
            results["single"][it]["pose_aps"], results["mesh"][it]["pose_aps"], atol=1e-7
        )
        np.testing.assert_allclose(
            results["single"][it]["iou_aps"], results["mesh"][it]["iou_aps"], atol=1e-7
        )


def test_run_inference_warmup_accounting(fake_real_root):  # noqa: F811
    """Deferred (overlapped) fetch must keep the warmup-skipped stats right:
    warmup batches are excluded from timing counts but their predictions are
    still processed."""
    dicts = _dicts_with_init(fake_real_root, noise=0.0)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)

    loader = CATRELoader(dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4,
                                             aug_depth=False),
                         phase="test", ims_per_batch=1)
    evaluator = CATREEvaluator(dicts, n_iters=1)
    stats = run_inference(refine, params, iter(loader), evaluator,
                          n_iters=1, warmup=1)
    assert stats["images"] == 1  # first batch excluded from timing
    # but BOTH frames were evaluated
    assert len(evaluator._preds[0]) == 2 and len(evaluator._preds[1]) == 2
    assert stats["compute_s_per_img"] > 0


def test_compute_probe_timing(fake_real_root):  # noqa: F811
    """compute_s_per_img uses synchronized probe batches (reference timing
    semantics, `catre_evaluator.py:267-319`); the overlapped attribution is
    reported separately."""
    dicts = _dicts_with_init(fake_real_root, noise=0.0)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)
    loader = CATRELoader(dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4,
                                             aug_depth=False),
                         phase="test", ims_per_batch=1)
    evaluator = CATREEvaluator(dicts, n_iters=1)
    stats = run_inference(refine, params, iter(loader), evaluator,
                          n_iters=1, warmup=0, compute_probe_every=1)
    assert stats["compute_s_per_img"] > 0
    assert stats["overlap_fetch_s_per_img"] >= 0
    assert len(evaluator._preds[1]) == 2


def test_slab_refine_bit_identical(fake_real_root):  # noqa: F811
    """slab_groups > 1 (one refine dispatch per slab of loader groups) must
    reproduce the per-group dispatch predictions BIT-exactly — the refine is
    per-object independent, so batch composition cannot change results.
    Covers a full slab (2 groups) and a partial tail flush (slab=3 with only
    2 groups)."""
    dicts = _dicts_with_init(fake_real_root, noise=0.02)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=2)

    preds = {}
    for slab in (1, 2, 3):
        loader = CATRELoader(
            dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4, aug_depth=False),
            phase="test", ims_per_batch=1, seed=0,
        )
        evaluator = CATREEvaluator(dicts, n_iters=2)
        stats = run_inference(refine, params, iter(loader), evaluator,
                              n_iters=2, warmup=0, slab_groups=slab)
        assert stats["images"] == 2
        preds[slab] = evaluator._preds
    for slab in (2, 3):
        for it in range(3):
            assert sorted(preds[slab][it]) == sorted(preds[1][it])
            assert preds[1][it], "no predictions recorded"
            for key in preds[1][it]:
                ps, p1 = preds[slab][it][key], preds[1][it][key]
                np.testing.assert_array_equal(ps["pred_RTs"], p1["pred_RTs"])
                np.testing.assert_array_equal(ps["pred_scales"], p1["pred_scales"])


def test_slab_requires_packed_path(fake_real_root):  # noqa: F811
    dicts = _dicts_with_init(fake_real_root, noise=0.0)
    cfg = CATREConfig(num_pcl=128, num_kps=1024)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=1)
    loader = CATRELoader(dicts, LoaderConfig(num_pcl=128, max_objs_per_image=4,
                                             aug_depth=False), phase="test", ims_per_batch=1)
    evaluator = CATREEvaluator(dicts, n_iters=1)
    with pytest.raises(ValueError, match="slab_groups"):
        run_inference(refine, params, iter(loader), evaluator, n_iters=1,
                      warmup=0, packed_inputs=False, slab_groups=2)
