"""Offline gt-label generation: produce per-frame `*_label.pkl` from depth +
NOCS coordinate maps + masks.

Behavioral reference: `preprocess/pose_data.py` — CAMERA gt via Umeyama
similarity between NOCS coords and backprojected depth (`:56-166`), REAL
train gt via PnP (`:342-417`), mug NOCS re-centering with mug_meta
(`:393-397`), image-list creation (`create_img_list`, `:168-188`).

Run: python -m catre_tpu.tools.pose_data --data-root datasets/NOCS --split real_test
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle

import numpy as np

from ..data import assets, meta
from .alignment import pnp_pose, ransac_umeyama


def decode_coord_map(coord_bgr: np.ndarray) -> np.ndarray:
    """NOCS coordinate map decode: BGR->RGB, z flip, center to [-0.5, 0.5]
    (`data_loader.py:434-440`)."""
    coord = coord_bgr[:, :, ::-1].astype(np.float32) / 255.0
    coord[:, :, 2] = 1.0 - coord[:, :, 2]
    return coord - 0.5


def backproject_masked(depth: np.ndarray, K: np.ndarray, mask: np.ndarray):
    """(pts (N,3), (rows, cols)) for valid masked pixels (`pose_data.py:90-106`)."""
    valid = np.logical_and(mask, depth > 0)
    rows, cols = np.where(valid)
    z = depth[rows, cols]
    x = (cols - K[0, 2]) * z / K[0, 0]
    y = (rows - K[1, 2]) * z / K[1, 1]
    return np.stack([x, y, z], axis=1), (rows, cols)


def align_instance_umeyama(coord: np.ndarray, depth: np.ndarray, mask: np.ndarray,
                           K: np.ndarray, seed: int = 0):
    """CAMERA-style gt: similarity transform NOCS->camera.

    Returns (nocs_scale s, R (3,3), t (3,)) or None when degenerate.
    """
    pts, (rows, cols) = backproject_masked(depth, K, mask)
    if len(pts) < 5:
        return None
    nocs = coord[rows, cols]
    s, R, t, _ = ransac_umeyama(nocs, pts, seed=seed)
    if s is None:
        return None
    return s, R, t


def align_instance_pnp(coord: np.ndarray, depth: np.ndarray, mask: np.ndarray,
                       K: np.ndarray, nocs_scale: float):
    """REAL-train-style gt: PnP between scaled NOCS coords and pixels.

    Returns (3, 4) pose or None.
    """
    valid = np.logical_and(mask, depth > 0)
    rows, cols = np.where(valid)
    if len(rows) < 6:
        return None
    pts3d = coord[rows, cols] * nocs_scale
    pts2d = np.stack([cols, rows], axis=1).astype(np.float64)
    return pnp_pose(pts3d, pts2d, K)


def process_frame(base_path: str, K: np.ndarray, method: str = "umeyama",
                  mug_meta: dict | None = None) -> dict | None:
    """Generate a `*_label.pkl` dict for one frame from its
    _depth/_mask/_coord/_meta files."""
    import cv2

    from ..data.loader import load_depth

    depth = load_depth(base_path + "_depth.png")
    mask_full = cv2.imread(base_path + "_mask.png", cv2.IMREAD_UNCHANGED)
    if mask_full is None:
        return None
    if mask_full.ndim == 3:
        mask_full = mask_full[:, :, 2]
    coord = decode_coord_map(cv2.imread(base_path + "_coord.png", cv2.IMREAD_COLOR))

    # _meta.txt: "<inst_id> <class_id> <model_name>" per line (NOCS format)
    metas = []
    with open(base_path + "_meta.txt") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                metas.append((int(parts[0]), int(parts[1]), parts[2]))

    label = {"instance_ids": [], "class_ids": [], "model_list": [],
             "rotations": [], "translations": [], "scales": [], "bboxes": []}
    for inst_id, class_id, model_name in metas:
        mask = mask_full == inst_id
        if mask.sum() < 30:
            continue
        coord_i = coord.copy()
        if mug_meta is not None and model_name in mug_meta:
            t0, s0 = mug_meta[model_name]
            # mug NOCS remap: nocs' = s0 * (nocs + t0) (`pose_data.py:393-397`)
            coord_i = s0 * (coord_i + t0.reshape(1, 1, 3))

        if method == "umeyama":
            out = align_instance_umeyama(coord_i, depth, mask, K)
            if out is None:
                continue
            s, R, t = out
        else:  # pnp: scale from the coord extent is not observable; use 1.0
            pose = align_instance_pnp(coord_i, depth, mask, K, nocs_scale=1.0)
            if pose is None:
                continue
            R, t, s = pose[:, :3], pose[:, 3], 1.0

        rows, cols = np.where(mask)
        y1, x1, y2, x2 = rows.min(), cols.min(), rows.max(), cols.max()
        label["instance_ids"].append(inst_id)
        label["class_ids"].append(class_id)
        label["model_list"].append(model_name)
        label["rotations"].append(R.astype(np.float32))
        label["translations"].append(np.asarray(t, dtype=np.float32))
        label["scales"].append(float(s))
        label["bboxes"].append([int(y1), int(x1), int(y2), int(x2)])
    if not label["instance_ids"]:
        return None
    return label


def create_img_list(split_dir: str, out_path: str) -> list:
    """Write `<split>_list_all.txt` (`pose_data.py:168-188`)."""
    split = osp.basename(split_dir.rstrip("/"))
    lines = []
    for scene in sorted(os.listdir(split_dir)):
        sdir = osp.join(split_dir, scene)
        if not osp.isdir(sdir):
            continue
        for fn in sorted(os.listdir(sdir)):
            if fn.endswith("_color.png"):
                lines.append(f"{split}/{scene}/{fn[: -len('_color.png')]}")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lines


def main():
    parser = argparse.ArgumentParser(description="generate gt label pkls")
    parser.add_argument("--data-root", default=meta.NOCS_ROOT)
    parser.add_argument("--split", default="real_test",
                        choices=["real_train", "real_test", "train", "val"])
    parser.add_argument("--method", default="umeyama", choices=["umeyama", "pnp"])
    args = parser.parse_args()

    sub = "REAL" if args.split.startswith("real") else "CAMERA"
    image_root = osp.join(args.data_root, sub)
    split_dir = osp.join(image_root, args.split)
    K = meta.REAL_INTRINSICS if sub == "REAL" else meta.CMRA_INTRINSICS
    try:
        mug_meta = assets.load_mug_meta()
    except FileNotFoundError:
        mug_meta = None

    lines = create_img_list(split_dir, osp.join(image_root, f"{args.split}_list_all.txt"))
    n_done = 0
    for rel in lines:
        base = osp.join(image_root, rel)
        label = process_frame(base, K, method=args.method, mug_meta=mug_meta)
        if label is None:
            continue
        with open(base + "_label.pkl", "wb") as f:
            pickle.dump(label, f)
        n_done += 1
    print(f"wrote {n_done}/{len(lines)} label files under {split_dir}")


if __name__ == "__main__":
    main()
