# Variant with batch 32 and DualPoseNet init poses (reference:
# `configs/catre/NOCS_REAL/..._120e_initspd.py`).

_base_ = ["./aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py"]

OUTPUT_DIR = (
    "output/catre_tpu/NOCS_REAL/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e_initspd"
)

SOLVER = dict(IMS_PER_BATCH=32)

DATASETS = dict(
    INIT_POSE_FILES_TEST=("datasets/NOCS/test_init_poses/init_pose_dualposenet_nocs_real.json",),
)
