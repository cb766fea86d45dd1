# TPU production variant of the shipped NOCS-REAL recipe: same data, model
# and loss semantics, with every TPU-native fast path enabled — bf16
# compute, the fused Pallas rot head (inference + custom-VJP training), the
# custom-VJP fused encoder epilogues, batched eval, and a per-chip instance
# batch at the measured throughput knee (docs/PERF.md: training saturates
# ~B=512 instances; 1340 obj/s/chip vs 928 at the reference batch).
#
# NOT a bit-for-bit recipe reproduction: the 4x image batch runs 4x fewer
# optimizer steps per epoch, compensated here by linear LR scaling
# (1e-4 -> 4e-4, Goyal et al.; warmup kept at 1000 iters = 4x more warmup
# data). Kernel-level numerics match the base recipe to tolerance
# (tests/test_fused_train.py, tests/test_encoder_vjp.py); end-recipe
# accuracy should be re-validated on real data before replacing the base
# config. Use the base config when exact reference-recipe training is the
# goal.

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

SOLVER = dict(
    IMS_PER_BATCH=64,  # ~512 instances/chip: the throughput knee
    OPTIMIZER_CFG=dict(lr=4e-4),  # linear LR scaling for the 4x batch
)

# CACHE_DECODED keeps the decoded dataset resident in HBM (~0.92 MB/frame:
# u16 depth + bit-packed masks — REAL275 train 4.3k frames ≈ 4 GB);
# steady-state training ships only PRNG keys + record indices per step, and
# single-process runs additionally keep the sampled clouds device-resident
# (device_batches, auto). Measured: loader 1745 obj/s > device 1340 obj/s
# (docs/PERF.md). INPUT.SAMPLE_WINDOW=-1 (auto) resolves to the smallest
# window covering every annotation bbox in the split, so the windowed
# ball-crop stays EXACTLY equal to the full-field sampler (the measured
# eval-pipeline lever, +~50% at window=128 — docs/PERF.md) with no
# truncation risk; the loader warns if a decoded mask ever exceeds it.
DATALOADER = dict(MAX_OBJS_TRAIN=512, NUM_WORKERS=4, CACHE_DECODED="device")
INPUT = dict(SAMPLE_WINDOW=-1)

TEST = dict(IMS_PER_BATCH=32)  # batched eval jit calls (knee: PERF.md)
