# TPU production variant of the shipped NOCS-REAL recipe: identical data /
# model / schedule semantics, with every TPU-native fast path enabled —
# bf16 compute, the fused Pallas rot head (inference + custom-VJP training),
# the custom-VJP fused encoder epilogues, batched eval, and a per-chip
# instance batch at the measured throughput knee (docs/PERF.md: training
# saturates ~B=512 instances; 1340 obj/s/chip vs 928 at the reference batch).
# Numerical parity with the base recipe is kernel-tolerance level
# (tests/test_fused_train.py, tests/test_encoder_vjp.py).

_base_ = ["./aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e.py"]

OUTPUT_DIR = (
    "output/catre_tpu/NOCS_REAL/aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e_tpu"
)

MODEL = dict(
    BF16=True,
    FUSED_HEADS=True,
    FUSED_HEADS_TRAIN=True,
    FUSED_ENCODER_EPILOGUE=True,
    FUSED_ENCODER_TRAIN=True,
)

SOLVER = dict(IMS_PER_BATCH=64)  # ~512 instances/chip: the throughput knee

DATALOADER = dict(MAX_OBJS_TRAIN=512, NUM_WORKERS=4)

TEST = dict(IMS_PER_BATCH=8)  # batched eval jit calls
