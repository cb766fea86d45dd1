"""Flagship-scale training soak driver (docs/TRAINRUN.md).

Runs the production `_tpu` recipe shape — 1024-pt clouds + 1024-pt mean-shape
keypoints, B>=512 flattened instances, 4 inner optimizer steps per batch,
fused Pallas kernels, Ranger + flat_and_anneal — against synthetic
REAL275-shaped data on disk, through the UNMODIFIED production path:
NOCSDataset registration -> CATRELoader (device cache + device batches) ->
do_train (TRAIN2 mixing, periodic eval + checkpoint, resume).

    python -m catre_tpu.tools.soak --data-root DIR --out DIR \
        [--epochs N] [--frames 2000] [--resume] [--opts K=V ...]

Mirrors the reference's 120-epoch recipe driver (`core/catre/engine/
engine.py:164-424`) at production scale; the kill+resume proof uses the
positional-RNG loader (`data/loader.py`) for bit-deterministic continuation.
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp
import sys

# asset pickles (mean shapes / abs scales) ship with the reference checkout
# (same default as tests/conftest.py and bench.py); must be set before the
# data modules read it at import time
if "CATRE_DATA_ROOT" not in os.environ and osp.isdir("/root/reference/datasets"):
    os.environ["CATRE_DATA_ROOT"] = "/root/reference/datasets"

from ..config.loader import apply_overrides, load_config
from ..data.nocs import _DATASET_REGISTRY, NOCSDataset
from .synth_nocs import generate_split

CFG_PATH = osp.join(
    osp.dirname(__file__), "..", "configs", "nocs_real",
    "aug05_kpsMS_r9d_catreDisR_shared_tspcl_convPerRot_scaleexp_120e_tpu.py")


def ensure_data(data_root: str, frames: int, frames2: int, frames_test: int) -> None:
    """Generate the three synthetic splits once (presence-checked by list
    file)."""
    specs = [
        ("real", "real_train", frames, 0),
        ("cmra", "train", frames2, 1),       # CAMERA-shaped TRAIN2 stream
        ("real", "real_test", frames_test, 2),
    ]
    for sub, split, n, seed in specs:
        root = osp.join(data_root, sub.upper())
        marker = osp.join(root, f"{split}_list_all.txt")
        if osp.exists(marker):
            continue
        print(f"[soak] generating {n} frames for {sub}/{split} ...", flush=True)
        generate_split(root, split=split, n_frames=n, n_objs=6, seed=seed)


def register(data_root: str) -> None:
    _DATASET_REGISTRY["nocs_train_real"] = NOCSDataset(
        "nocs_train_real", image_root=osp.join(data_root, "REAL"), use_cache=True)
    _DATASET_REGISTRY["nocs_train_cmra"] = NOCSDataset(
        "nocs_train_cmra", image_root=osp.join(data_root, "CMRA"), use_cache=True)
    _DATASET_REGISTRY["nocs_test_real"] = NOCSDataset(
        "nocs_test_real", image_root=osp.join(data_root, "REAL"), use_cache=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--epochs", type=int, default=800)
    p.add_argument("--frames", type=int, default=2000)
    p.add_argument("--frames2", type=int, default=600)
    p.add_argument("--frames-test", type=int, default=192)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, stream=sys.stdout,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ensure_data(args.data_root, args.frames, args.frames2, args.frames_test)
    register(args.data_root)

    cfg = load_config(osp.abspath(CFG_PATH))
    apply_overrides(cfg, [
        f"SOLVER.TOTAL_EPOCHS={args.epochs}",
        "SOLVER.CHECKPOINT_PERIOD=25",       # epochs (~775 iters at 2000/64)
        "SOLVER.MAX_TO_KEEP=5",
        "SOLVER.ANNEAL_POINT=0.72",
        "DATASETS.TRAIN2=('nocs_train_cmra',)",
        "DATASETS.TRAIN2_RATIO=0.25",
        "DATALOADER.CACHE_DECODED='device'",
        "DATALOADER.NUM_WORKERS=8",
        "INPUT.INIT_POSE_TYPE_TEST='gt_noise'",
        "MODEL.LOAD_POSES_TEST=False",
        "TEST.EVAL_PERIOD=3000",             # iters: a few evals per soak
        "TEST.IMS_PER_BATCH=32",
        "TRAIN.PRINT_FREQ=50",
        "SEED=11",
    ] + list(args.opts))
    cfg["OUTPUT_DIR"] = args.out

    from ..engine.runner import do_train

    do_train(cfg, resume=args.resume)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
