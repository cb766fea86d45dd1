"""CLI / config-loader behavior tests."""

import os.path as osp

import pytest

from catre_tpu.config.loader import apply_overrides, load_config, merge_a_into_b

CFG_DIR = osp.join(osp.dirname(__file__), "../catre_tpu/configs")


def test_shipped_config_loads():
    cfg = load_config(osp.join(
        CFG_DIR, "nocs_real/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py"))
    # base values survive
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.MODEL.CATRE.N_ITER_TRAIN == 4
    # experiment overrides applied over base
    assert cfg.INPUT.NUM_PCL == 1024
    assert cfg.INPUT.KPS_TYPE == "mean_shape"
    assert cfg.INPUT.ZERO_CENTER_INPUT is True
    # _delete_ semantics: OPTIMIZER_CFG replaced wholesale
    assert cfg.SOLVER.OPTIMIZER_CFG == {"type": "Ranger", "lr": 1e-4, "weight_decay": 0}
    # keys only in base survive the merge
    assert cfg.INPUT.INIT_TRANS_MIN_Z == 0.1
    assert cfg.MODEL.CATRE.ROT_HEAD.DELTA_T_SPACE == "image"
    assert cfg.MODEL.CATRE.ROT_HEAD.SCLAE_TYPE == "iter_add"


def test_initspd_variant_inherits_experiment():
    cfg = load_config(osp.join(
        CFG_DIR, "nocs_real/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e_initspd.py"))
    assert cfg.SOLVER.IMS_PER_BATCH == 32
    assert "dualposenet" in cfg.DATASETS.INIT_POSE_FILES_TEST[0]
    assert cfg.INPUT.NUM_PCL == 1024  # from the parent experiment


def test_overrides():
    cfg = load_config(osp.join(CFG_DIR, "_base_/catre_base.py"))
    apply_overrides(cfg, ["SOLVER.IMS_PER_BATCH=4", "MODEL.WEIGHTS='x.pth'",
                          "INPUT.NOISE_ROT_STD_TRAIN=(5,2.5)", "DEBUG=True"])
    assert cfg.SOLVER.IMS_PER_BATCH == 4
    assert cfg.MODEL.WEIGHTS == "x.pth"
    assert cfg.INPUT.NOISE_ROT_STD_TRAIN == (5, 2.5)
    assert cfg.DEBUG is True


def test_merge_delete_semantics():
    base = {"A": {"x": 1, "y": 2}, "B": 3}
    over = {"A": {"_delete_": True, "z": 9}}
    out = merge_a_into_b(over, base)
    assert out["A"] == {"z": 9}
    assert out["B"] == 3


def test_config_builders():
    from catre_tpu.config.build import (
        loader_config_from, loss_config_from, model_config_from, noise_config_from,
    )

    cfg = load_config(osp.join(
        CFG_DIR, "nocs_real/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py"))
    mcfg = model_config_from(cfg)
    assert mcfg.num_pcl == 1024 and mcfg.num_kps == 1024
    assert mcfg.zero_center_input and mcfg.ts_with_init_scale
    assert not mcfg.ts_with_kps_feature
    assert mcfg.scale_type == "iter_add" and mcfg.delta_t_space == "image"
    lcfg = loss_config_from(cfg)
    assert lcfg.pm_loss_sym and lcfg.pm_r_only and lcfg.pm_with_scale
    assert lcfg.rot_lw == 1.0 and lcfg.trans_lw == 1.0 and lcfg.scale_lw == 1.0
    ncfg = noise_config_from(cfg)
    assert ncfg.noise_rot_std == (10, 5, 2.5, 1.25)
    assert ncfg.bbox3d_aug_prob == 0.5 and ncfg.rt_aug_prob == 0.5
    dcfg = loader_config_from(cfg, "train")
    assert dcfg.num_pcl == 1024 and dcfg.depth_sample_ball_ratio == 0.6
    assert dcfg.aug_depth


def test_main_argparser():
    from catre_tpu.main import my_default_argument_parser

    p = my_default_argument_parser()
    args = p.parse_args(["--config-file", "x.py", "--eval-only",
                         "MODEL.WEIGHTS=a.pth", "SOLVER.IMS_PER_BATCH=2"])
    assert args.eval_only and args.config_file == "x.py"
    assert args.opts == ["MODEL.WEIGHTS=a.pth", "SOLVER.IMS_PER_BATCH=2"]


def test_tpu_variant_config():
    """The _tpu production variant inherits the recipe and enables every
    TPU fast path; it must validate clean under strict mode."""
    from catre_tpu.config.build import model_config_from, validate_config
    from catre_tpu.config.loader import load_config

    cfg = load_config(osp.join(
        CFG_DIR, "nocs_real",
        "aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e_tpu.py"))
    assert validate_config(cfg, strict=True) == []
    mc = model_config_from(cfg)
    assert mc.fused_heads and mc.fused_heads_train and mc.fused_encoder_train
    assert mc.dtype is not None  # bf16
    # recipe semantics inherited from the base experiment
    assert cfg.MODEL.CATRE.N_ITER_TEST == 4
    assert cfg.INPUT.KPS_TYPE == "mean_shape"
    assert cfg.SOLVER.IMS_PER_BATCH == 64
