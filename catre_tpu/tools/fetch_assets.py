"""Asset checker / runbook for the real-checkpoint parity harness.

The released CATRE checkpoint and the NOCS REAL275 frames are distributed
out-of-band (reference `README.md:36-46` points at the authors' OneDrive and
the NOCS release); this environment has no network egress, so this tool
VERIFIES the expected on-disk layout and prints exactly what is missing and
where to put it. Once everything is in place, the guarded tests in
`tests/test_real_assets.py` stop skipping and run the convert -> refine ->
parity pipeline automatically.

Usage:
    python -m catre_tpu.tools.fetch_assets [--data-root datasets]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

CKPT_NAME = "model_final_wo_optim-82cf930e.pth"

EXPECTED = [
    # (relative path, what it is, where it comes from)
    (osp.join("checkpoints", CKPT_NAME),
     "released CATRE weights (md5 prefix 82cf930e)",
     "reference README.md:42 (authors' OneDrive link)"),
    (osp.join("NOCS", "REAL", "real_test_list_all.txt"),
     "REAL275 test frame list",
     "NOCS release (real_test.zip) / reference datasets/NOCS layout"),
    (osp.join("NOCS", "obj_models", "cr_normed_mean_model_points_spd.pkl"),
     "category mean shapes (1024 pts)",
     "reference datasets/NOCS/obj_models"),
    (osp.join("NOCS", "obj_models", "abs_scale.pkl"),
     "instance metric sizes",
     "reference datasets/NOCS/obj_models"),
    (osp.join("NOCS", "test_init_poses", "init_pose_spd_nocs_real.json"),
     "SPD initial estimates (optional; gt_noise mode works without)",
     "reference datasets/NOCS/test_init_poses"),
]


def check(data_root: str) -> int:
    missing = []
    print(f"checking assets under {data_root}\n")
    for rel, what, src in EXPECTED:
        path = osp.join(data_root, rel)
        ok = osp.isfile(path)
        print(f"  [{'ok' if ok else 'MISSING'}] {rel}  — {what}")
        if not ok:
            missing.append((rel, src))

    # frames need at least one depth+label pair
    lst = osp.join(data_root, "NOCS", "REAL", "real_test_list_all.txt")
    n_frames = 0
    if osp.isfile(lst):
        with open(lst) as f:
            for line in f:
                base = osp.join(data_root, "NOCS", "REAL", line.strip())
                if osp.isfile(base + "_depth.png") and osp.isfile(base + "_label.pkl"):
                    n_frames += 1
        print(f"\n  {n_frames} complete frames (depth+label) found")
        if n_frames == 0:
            missing.append(("NOCS/REAL/real_test/*_depth.png + *_label.pkl",
                            "NOCS release; labels via "
                            "`python -m catre_tpu.tools.pose_data --split real_test`"))

    if not missing:
        print("\nall assets present — run: "
              "pytest tests/test_real_assets.py -v")
        return 0
    print("\nmissing assets:")
    for rel, src in missing:
        print(f"  - {rel}\n      source: {src}")
    print(f"\nplace them under {data_root}/ (or set CATRE_DATA_ROOT / "
          f"CATRE_REAL_CKPT), then re-run this tool.")
    return 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root",
                    default=os.environ.get("CATRE_DATA_ROOT", "datasets"))
    args = ap.parse_args()
    return check(args.data_root)


if __name__ == "__main__":
    sys.exit(main())
