"""Loaders for the NOCS asset pickles (mean shapes, model points, abs scales,
mug metadata).  Reference: `ref/nocs.py:26-31,160-173` + asset files under
`datasets/NOCS/obj_models/` (SURVEY.md §2.4)."""

from __future__ import annotations

import os.path as osp
import pickle
from functools import lru_cache

import numpy as np

from . import meta


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


@lru_cache(maxsize=None)
def load_mean_shapes(path: str = meta.CR_MEAN_MODEL_PATH) -> dict:
    """category -> (1024, 3) float32 mean-shape points."""
    d = _load_pickle(path)
    return {k: np.asarray(v, dtype=np.float32) for k, v in d.items()}


def mean_shape_array(path: str = meta.CR_MEAN_MODEL_PATH) -> np.ndarray:
    """(6, 1024, 3) mean shapes indexed by 0-based category id."""
    shapes = load_mean_shapes(path)
    return np.stack([shapes[meta.ID2OBJ[i + 1]] for i in range(6)])


@lru_cache(maxsize=None)
def load_model_points(split: str = "test") -> dict:
    """instance -> (1024, 3) model points (real_{train,test}_spd.pkl)."""
    path = meta.TRAIN_MODEL_PATH if split == "train" else meta.TEST_MODEL_PATH
    d = _load_pickle(path)
    return {k: np.asarray(v, dtype=np.float32) for k, v in d.items()}


@lru_cache(maxsize=None)
def load_abs_scales(path: str = meta.ABS_SCALE_PATH) -> dict:
    """instance -> (3,) metric size."""
    d = _load_pickle(path)
    return {k: np.asarray(v, dtype=np.float32) for k, v in d.items()}


@lru_cache(maxsize=None)
def load_mug_meta(path: str = meta.MUG_META_PATH) -> dict:
    """mug instance -> (t0 (3,), s0 scalar) NOCS remap (`nocs.py:104-107`,
    used `data_loader.py:606-609`: nocs = s0 * (nocs + t0))."""
    d = _load_pickle(path)
    return {k: (np.asarray(v[0], dtype=np.float32), float(v[1])) for k, v in d.items()}


@lru_cache(maxsize=None)
def load_mug_handle(path: str = meta.MUG_HANDLE_PATH) -> dict:
    """scene_im or instance key -> handle visibility flag."""
    return _load_pickle(path)


@lru_cache(maxsize=None)
def load_fps_points(path: str = meta.FPS_POINTS_PATH) -> dict:
    if not osp.exists(path):
        raise FileNotFoundError(path)
    d = _load_pickle(path)
    return {k: np.asarray(v, dtype=np.float32) for k, v in d.items()}
