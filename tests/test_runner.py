"""End-to-end runner tests: config load -> do_train (few iters) -> resume ->
do_test (gt_noise validation mode), all on the synthetic on-disk dataset."""

import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.config.loader import apply_overrides, load_config
from catre_tpu.data.nocs import _DATASET_REGISTRY, NOCSDataset
from catre_tpu.engine.runner import do_test, do_train

from test_data_pipeline import fake_real_root  # noqa: F401  (fixture)

CFG_PATH = osp.join(
    osp.dirname(__file__),
    "../catre_tpu/configs/nocs_real/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py",
)


def _small_cfg(tmp_path, fake_real_root):
    cfg = load_config(CFG_PATH)
    apply_overrides(cfg, [
        "SOLVER.TOTAL_EPOCHS=2",
        "SOLVER.IMS_PER_BATCH=2",
        "SOLVER.WARMUP_ITERS=1",
        "SOLVER.CHECKPOINT_PERIOD=1",
        "INPUT.NUM_PCL=64",
        "INPUT.NUM_KPS=1024",
        "MODEL.CATRE.N_ITER_TRAIN=2",
        "MODEL.CATRE.N_ITER_TRAIN_WARM_EPOCH=2",
        "MODEL.CATRE.N_ITER_TEST=2",
        "MODEL.LOAD_POSES_TEST=False",
        "INPUT.INIT_POSE_TYPE_TEST='gt_noise'",
        "DATALOADER.MAX_OBJS_PER_IMAGE=2",
        "TRAIN.PRINT_FREQ=1",
        "SEED=3",
    ])
    cfg["OUTPUT_DIR"] = str(tmp_path / "out")
    # register train/test splits against the fixture root
    for name in ["nocs_train_real", "nocs_test_real"]:
        _DATASET_REGISTRY[name] = NOCSDataset(
            name.replace("train", "test"), image_root=fake_real_root, use_cache=False
        )
    return cfg


def test_train_multichip_mesh(tmp_path, fake_real_root):  # noqa: F811
    """NUM_CHIPS=8 trains over the virtual CPU mesh (GSPMD data parallel)."""
    cfg = _small_cfg(tmp_path, fake_real_root)
    apply_overrides(cfg, ["SOLVER.TOTAL_EPOCHS=1", "NUM_CHIPS=8",
                          "DATALOADER.MAX_OBJS_PER_IMAGE=4"])
    cfg["OUTPUT_DIR"] = str(tmp_path / "out_mc")
    do_train(cfg, resume=False)
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "metrics.json"))


def test_train_resume_and_eval(tmp_path, fake_real_root):  # noqa: F811
    cfg = _small_cfg(tmp_path, fake_real_root)
    do_train(cfg, resume=False)
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "metrics.json"))
    # resume restores iteration and runs to completion without error
    do_train(cfg, resume=True)

    results = do_test(cfg)
    res = results["nocs_test_real"]["results"]
    assert 0 in res and 2 in res
    # iter0 comes from perturbed gt; APs must be finite numbers
    assert np.isfinite(list(res[0]["summary"].values())).all()


def test_eval_with_fused_heads(tmp_path, fake_real_root):  # noqa: F811
    """MODEL.FUSED_HEADS=True routes eval through the Pallas kernels
    (interpreter on CPU) end-to-end via config plumbing."""
    cfg = _small_cfg(tmp_path, fake_real_root)
    apply_overrides(cfg, ["SOLVER.TOTAL_EPOCHS=1", "MODEL.FUSED_HEADS=True",
                          "MODEL.FUSED_HEADS_TRAIN=True",
                          "MODEL.FUSED_ENCODER_TRAIN=True"])
    cfg["OUTPUT_DIR"] = str(tmp_path / "out_fused")
    do_train(cfg, resume=False)
    results = do_test(cfg)
    res = results["nocs_test_real"]["results"]
    assert np.isfinite(list(res[0]["summary"].values())).all()


def test_train_and_test_vis(tmp_path, fake_real_root):  # noqa: F811
    """TRAIN.VIS_IMG logs the reference's three keypoint images to tb
    (ref engine.py:370-422); TEST.VIS writes per-refine-iteration box-overlay
    grids (ref catre_evaluator.py:633-679)."""
    import glob

    cfg = _small_cfg(tmp_path, fake_real_root)
    apply_overrides(cfg, ["SOLVER.TOTAL_EPOCHS=1", "TRAIN.VIS_IMG=True",
                          "TEST.VIS=True"])
    cfg["OUTPUT_DIR"] = str(tmp_path / "out_vis")
    do_train(cfg, resume=False)

    from tensorboard.backend.event_processing import event_accumulator

    ea = event_accumulator.EventAccumulator(osp.join(cfg.OUTPUT_DIR, "tb"))
    ea.Reload()
    tags = set(ea.Tags().get("images", []))
    assert {"input_image", "image_with_gt_kps", "image_with_est_kps"} <= tags

    do_test(cfg)
    assert glob.glob(osp.join(cfg.OUTPUT_DIR, "vis", "*_iters.png"))


def test_save_results_and_cached_eval(tmp_path, fake_real_root):  # noqa: F811
    """TEST.SAVE_RESULTS_ONLY dumps per-iteration results pkl; VAL.EVAL_CACHED
    re-scores saved predictions without the model and reproduces the scores
    (ref `catre_custom_evaluator.py:74-79,226-235`)."""
    import pickle

    cfg = _small_cfg(tmp_path, fake_real_root)
    cfg["OUTPUT_DIR"] = str(tmp_path / "out_cached")

    # full eval writes predictions.pkl next to the metric tables
    res1 = do_test(cfg)["nocs_test_real"]["results"]
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "predictions.pkl"))

    # cached re-score: no model, same scores
    apply_overrides(cfg, ["VAL.EVAL_CACHED=True"])
    res2 = do_test(cfg)["nocs_test_real"]["results"]
    for it in res1:
        for k, v in res1[it]["summary"].items():
            np.testing.assert_allclose(res2[it]["summary"][k], v, atol=1e-12)

    # save-results-only: per-iteration pkl keyed by scene_im_id
    apply_overrides(cfg, ["VAL.EVAL_CACHED=False", "TEST.SAVE_RESULTS_ONLY=True"])
    cfg["OUTPUT_DIR"] = str(tmp_path / "out_save")
    do_test(cfg)
    path = osp.join(cfg.OUTPUT_DIR, "results_nocs_test_real.pkl")
    assert osp.exists(path)
    with open(path, "rb") as f:
        saved = pickle.load(f)
    sid = next(iter(saved))
    assert "pred_RTs_0" in saved[sid] and "pred_RTs_2" in saved[sid]
    assert "gt_RTs" in saved[sid] and "pred_class_ids" in saved[sid]


def test_train_profile_iters(tmp_path, fake_real_root):  # noqa: F811
    """TRAIN.PROFILE_ITERS captures a jax.profiler trace into OUTPUT_DIR."""
    import os

    cfg = _small_cfg(tmp_path, fake_real_root)
    apply_overrides(cfg, ["SOLVER.TOTAL_EPOCHS=1", "TRAIN.PROFILE_ITERS=1"])
    cfg["OUTPUT_DIR"] = str(tmp_path / "out_prof")
    do_train(cfg, resume=False)
    prof = os.path.join(cfg.OUTPUT_DIR, "profile")
    assert os.path.isdir(prof)
    assert any(files for _, _, files in os.walk(prof))
