"""Generate FPS keypoints per instance (`fps_points_spd.pkl`) from the model
point pickles — the asset used by the KPS_TYPE='fps' ablation (reference:
`core/catre/tools/nocs/nocs_fps_sample.py`, `ref/nocs.py:160-166`).

Run: python -m catre_tpu.tools.fps_sample --split test --num-points 32
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

import jax.numpy as jnp

from ..data import assets, meta
from ..ops.sampling import farthest_point_indices


def main():
    parser = argparse.ArgumentParser(description="FPS keypoint sampling")
    parser.add_argument("--split", default="test", choices=["train", "test", "both"])
    parser.add_argument("--num-points", type=int, default=32)
    parser.add_argument("--out", default=meta.FPS_POINTS_PATH)
    args = parser.parse_args()

    splits = ["train", "test"] if args.split == "both" else [args.split]
    out = {}
    for split in splits:
        models = assets.load_model_points(split)
        for inst, pts in models.items():
            idx = np.asarray(farthest_point_indices(jnp.asarray(pts), args.num_points))
            # reference-compatible nested layout (`data_loader.py:337-352`
            # consumes `fps{N}_and_center` and drops the trailing center):
            # N fps keypoints + the model centroid as the final row
            out[inst] = {
                f"fps{args.num_points}_and_center": np.concatenate(
                    [pts[idx], pts.mean(axis=0, keepdims=True)], axis=0
                ).astype(np.float32)
            }
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {len(out)} instances x {args.num_points} fps points to {args.out}")


if __name__ == "__main__":
    main()
