"""Image-space color augmentation and background replacement.

Behavioral reference: `core/base_data_loader.py:233-339` (imgaug/albumentations
AAE-style color augmentors, gated by INPUT.COLOR_AUG_PROB) and `:340-553`
(random background replacement from a still-image pool, gated by
INPUT.CHANGE_BG_PROB).  Both are OFF in every shipped CATRE config — CATRE
consumes depth-backprojected point clouds — but the RGB path matters when
INPUT.PCL_WITH_COLOR samples aligned per-point colors, so the same knobs are
provided here on plain numpy/cv2 (no imgaug dependency).

The augmentor mirrors the reference's AAE chain (each op applied with an
independent coin): gaussian blur, per-image additive shift, per-channel
multiply, contrast normalization, and (low-probability) channel inversion.
"""

from __future__ import annotations

import os

import numpy as np


def color_augment(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """AAE-style color augmentation on an RGB uint8/float image (H, W, 3).

    Returns the same dtype as the input; all math in float32.
    """
    dtype = img.dtype
    x = img.astype(np.float32)
    scale = 255.0 if img.dtype == np.uint8 or x.max() > 1.5 else 1.0

    if rng.random() < 0.4:  # gaussian blur, sigma ~ U(0, 1.2)
        try:
            import cv2

            sigma = float(rng.uniform(0.2, 1.2))
            x = cv2.GaussianBlur(x, (5, 5), sigma)
        except ImportError:
            pass
    if rng.random() < 0.5:  # additive brightness shift +-0.1 * range
        x = x + rng.uniform(-0.1, 0.1) * scale
    if rng.random() < 0.5:  # per-channel multiply
        x = x * rng.uniform(0.7, 1.3, size=(1, 1, 3)).astype(np.float32)
    if rng.random() < 0.5:  # contrast normalization around the mean
        m = x.mean(axis=(0, 1), keepdims=True)
        x = (x - m) * rng.uniform(0.5, 1.5) + m
    if rng.random() < 0.1:  # rare channel inversion (AAE Invert p=0.?)
        ch = int(rng.integers(3))
        x[:, :, ch] = scale - x[:, :, ch]

    x = np.clip(x, 0.0, scale)
    return x.astype(dtype) if dtype == np.uint8 else x


def _list_bg_images(bg_dir: str) -> list:
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    try:
        return sorted(
            os.path.join(bg_dir, f) for f in os.listdir(bg_dir)
            if f.lower().endswith(exts)
        )
    except OSError:
        return []


def replace_background(rng: np.random.Generator, img: np.ndarray,
                       fg_mask: np.ndarray, bg_dir: str) -> np.ndarray:
    """Replace pixels OUTSIDE the foreground-mask union with a random still
    image from `bg_dir` (reference: VOC/COCO pools, `base_data_loader.py:
    340-553`).  No-op when the directory yields no readable image."""
    files = _list_bg_images(bg_dir)
    if not files:
        return img
    try:
        import cv2
    except ImportError:
        return img
    bg = cv2.imread(files[int(rng.integers(len(files)))], cv2.IMREAD_COLOR)
    if bg is None:
        return img
    h, w = img.shape[:2]
    bg = cv2.resize(bg, (w, h))[:, :, ::-1]  # BGR -> RGB
    if img.dtype != np.uint8:
        scale = 255.0 if img.max() > 1.5 else 1.0
        bg = bg.astype(img.dtype) * (scale / 255.0)
    out = img.copy()
    m = fg_mask.astype(bool)
    out[~m] = bg[~m]
    return out
