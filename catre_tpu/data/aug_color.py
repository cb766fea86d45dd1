"""Image-space color augmentation and background replacement.

Behavioral reference: `core/base_data_loader.py:233-339` — the COLOR_AUG_TYPE
selector over augmentor families (roi10d / aae / code) — and `:340-553`
(random background replacement, gated by INPUT.CHANGE_BG_PROB). Both are OFF
in every shipped CATRE config (CATRE consumes depth-backprojected clouds),
but the RGB path matters when INPUT.PCL_WITH_COLOR samples aligned per-point
colors, so the same selector surface is provided here on plain numpy/cv2.

Instead of depending on imgaug, the ops the reference's shipped chains use
(Sequential/Sometimes/OneOf combinators; CoarseDropout, GaussianBlur, Add,
Invert, Multiply, LinearContrast) are implemented directly, and
COLOR_AUG_TYPE="code" evaluates COLOR_AUG_CODE against THIS namespace — the
reference's aae chain string (`base_data_loader.py:251-262`) evaluates
unchanged. COLOR_AUG_TYPE="code_albu" (albumentations DSL) is not supported
and raises; `roi10d` reproduces AugmentRGB (`core/utils/augment.py:7-125`:
shuffled brightness/saturation/contrast jitter on [0,1] floats).

Every op takes (rng, img_uint8) and returns uint8; randomness comes from the
caller's positional generator (loader stream 3), not global state.
"""

from __future__ import annotations

import os

import numpy as np


# ------------------------------------------------------------- imgaug-style
class Sequential:
    """Apply ops in order (`random_order` kept for signature parity; the
    shipped chains use random_order=False)."""

    def __init__(self, ops, random_order: bool = False):
        self.ops = list(ops)
        self.random_order = random_order

    def __call__(self, rng, img):
        ops = self.ops
        if self.random_order:
            ops = [self.ops[i] for i in rng.permutation(len(self.ops))]
        for op in ops:
            img = op(rng, img)
        return img


class Sometimes:
    def __init__(self, p, op):
        self.p, self.op = float(p), op

    def __call__(self, rng, img):
        return self.op(rng, img) if rng.random() < self.p else img


class OneOf:
    def __init__(self, ops):
        self.ops = list(ops)

    def __call__(self, rng, img):
        return self.ops[int(rng.integers(len(self.ops)))](rng, img)


def _per_channel(rng, prob) -> bool:
    return rng.random() < float(prob)


class CoarseDropout:
    """Zero coarse rectangles: a low-res bernoulli(p) mask at `size_percent`
    scale, upsampled nearest (imgaug CoarseDropout semantics)."""

    def __init__(self, p=0.1, size_percent=0.05):
        self.p, self.size_percent = float(p), float(size_percent)

    def __call__(self, rng, img):
        h, w = img.shape[:2]
        lh = max(1, int(round(h * self.size_percent)))
        lw = max(1, int(round(w * self.size_percent)))
        drop = rng.random((lh, lw)) < self.p
        mask = np.repeat(np.repeat(drop, -(-h // lh), axis=0)[:h],
                         -(-w // lw), axis=1)[:, :w]
        out = img.copy()
        out[mask] = 0
        return out


class GaussianBlur:
    def __init__(self, sigma=1.0):
        self.sigma = float(sigma)

    def __call__(self, rng, img):
        if self.sigma <= 0:
            return img
        import cv2

        return cv2.GaussianBlur(img, (0, 0), self.sigma)


class Add:
    def __init__(self, value=(-20, 20), per_channel=0.0):
        self.lo, self.hi = value
        self.per_channel = per_channel

    def __call__(self, rng, img):
        shape = (1, 1, 3) if _per_channel(rng, self.per_channel) else (1, 1, 1)
        delta = rng.integers(self.lo, self.hi + 1, size=shape)
        return np.clip(img.astype(np.int32) + delta, 0, 255).astype(np.uint8)


class Invert:
    def __init__(self, p=0.2, per_channel=False):
        self.p, self.per_channel = float(p), bool(per_channel)

    def __call__(self, rng, img):
        out = img.copy()
        if self.per_channel:
            for c in range(img.shape[-1]):
                if rng.random() < self.p:
                    out[:, :, c] = 255 - out[:, :, c]
        elif rng.random() < self.p:
            out = 255 - out
        return out


class Multiply:
    def __init__(self, mul=(0.8, 1.2), per_channel=0.0):
        self.lo, self.hi = mul
        self.per_channel = per_channel

    def __call__(self, rng, img):
        shape = (1, 1, 3) if _per_channel(rng, self.per_channel) else (1, 1, 1)
        m = rng.uniform(self.lo, self.hi, size=shape).astype(np.float32)
        return np.clip(img.astype(np.float32) * m, 0, 255).astype(np.uint8)


class LinearContrast:
    """x' = 127 + alpha (x - 127) (imgaug LinearContrast)."""

    def __init__(self, alpha=(0.6, 1.4), per_channel=0.0):
        self.lo, self.hi = alpha
        self.per_channel = per_channel

    def __call__(self, rng, img):
        shape = (1, 1, 3) if _per_channel(rng, self.per_channel) else (1, 1, 1)
        a = rng.uniform(self.lo, self.hi, size=shape).astype(np.float32)
        return np.clip(127.0 + a * (img.astype(np.float32) - 127.0),
                       0, 255).astype(np.uint8)


# the reference's shipped AAE chain (`base_data_loader.py:251-262`; the
# GaussianBlur sigma there is `1.2*np.random.rand()` SAMPLED AT BUILD TIME —
# one fixed sigma per run — reproduced by evaluating the same expression)
def _aae_chain(rng_build: np.random.Generator) -> Sequential:
    return Sequential([
        Sometimes(0.5, CoarseDropout(p=0.2, size_percent=0.05)),
        Sometimes(0.5, GaussianBlur(1.2 * rng_build.random())),
        Sometimes(0.5, Add((-25, 25), per_channel=0.3)),
        Sometimes(0.3, Invert(0.2, per_channel=True)),
        Sometimes(0.5, Multiply((0.6, 1.4), per_channel=0.5)),
        Sometimes(0.5, Multiply((0.6, 1.4))),
        Sometimes(0.5, LinearContrast((0.5, 2.2), per_channel=0.3)),
    ], random_order=False)


class AugmentRGB:
    """roi10d family (`core/utils/augment.py:7-125`): shuffled
    brightness/saturation/contrast jitter on [0,1] floats."""

    def __init__(self, brightness_delta=32.0 / 255.0, lighting_std=0.3,
                 saturation_var=(0.75, 1.25), contrast_var=(0.75, 1.25)):
        self.brightness_delta = brightness_delta
        self.lighting_std = lighting_std
        self.saturation_var = saturation_var
        self.contrast_var = contrast_var

    def __call__(self, rng, img):
        x = img.astype(np.float32) / 255.0
        jitters = [self._brightness, self._saturation, self._contrast]
        for j in rng.permutation(len(jitters)):
            x = jitters[int(j)](rng, x)
        return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    def _brightness(self, rng, x):
        d = self.brightness_delta
        return np.clip(x + (-d + 2 * rng.random() * d), 0.0, 1.0)

    def _saturation(self, rng, x):
        lo, hi = self.saturation_var
        f = lo + 2 * rng.random() * (hi - lo)
        gray = (x * np.array([0.299, 0.587, 0.114], np.float32)).sum(-1, keepdims=True)
        return np.clip(f * x + (1 - f) * gray, 0.0, 1.0)

    def _contrast(self, rng, x):
        lo, hi = self.contrast_var
        f = lo + 2 * rng.random() * (hi - lo)
        m = x.mean(axis=(0, 1))
        return np.clip((x - m) * f + m, 0.0, 1.0)


def build_color_augmentor(aug_type: str = "aae", aug_code: str = "",
                          seed: int = 0):
    """COLOR_AUG_TYPE selector (`base_data_loader.py:233-322`): returns a
    callable (rng, uint8 RGB) -> uint8 RGB."""
    t = (aug_type or "").lower()
    rng_build = np.random.default_rng(seed)
    if t == "roi10d":
        return AugmentRGB(brightness_delta=2.5 / 255.0, lighting_std=0.3,
                          saturation_var=(0.95, 1.05), contrast_var=(0.95, 1.05))
    if t == "aae":
        return _aae_chain(rng_build)
    if t == "code":
        namespace = {
            "Sequential": Sequential, "Sometimes": Sometimes, "OneOf": OneOf,
            "CoarseDropout": CoarseDropout, "GaussianBlur": GaussianBlur,
            "Add": Add, "Invert": Invert, "Multiply": Multiply,
            "LinearContrast": LinearContrast, "np": np,
        }
        # the reference evals COLOR_AUG_CODE against imgaug
        # (`base_data_loader.py:276-287`); here against the ops above
        return eval(aug_code, {"__builtins__": {}}, namespace)  # noqa: S307
    if t == "code_albu":
        raise NotImplementedError(
            "COLOR_AUG_TYPE='code_albu' (albumentations DSL, "
            "base_data_loader.py:288-318) is not supported in this build — "
            "use 'code' with the imgaug-style ops namespace")
    raise ValueError(f"COLOR_AUG_TYPE {aug_type!r} is not supported")


def color_augment(rng: np.random.Generator, img: np.ndarray,
                  augmentor=None) -> np.ndarray:
    """Apply a color augmentor (default: the AAE chain) to an RGB image.
    Accepts uint8 or float input; returns the same dtype."""
    if augmentor is None:
        augmentor = _aae_chain(rng)
    dtype = img.dtype
    if dtype == np.uint8:
        return augmentor(rng, img)
    scale = 255.0 if img.max() > 1.5 else 1.0
    u8 = np.clip(img * (255.0 / scale), 0, 255).astype(np.uint8)
    return augmentor(rng, u8).astype(np.float32) * (scale / 255.0)


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
                       fg_mask: np.ndarray, bg_dir: str,
                       truncate_fg: bool = False) -> np.ndarray:
    """Replace pixels OUTSIDE the foreground-mask union with a random still
    image from `bg_dir` (reference: VOC/COCO pools, `base_data_loader.py:
    340-553`). truncate_fg additionally erases a random half-plane of the
    foreground (the TRUNCATE_FG occlusion flavor, `:412-437`). No-op when the
    directory yields no readable image."""
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
    m = fg_mask.astype(bool)
    if truncate_fg and m.any():
        ys, xs = np.nonzero(m)
        if rng.random() < 0.5:  # vertical cut through the fg bbox
            cut = int(rng.integers(xs.min(), max(xs.max(), xs.min() + 1) + 1))
            half = np.zeros_like(m)
            if rng.random() < 0.5:
                half[:, :cut] = True
            else:
                half[:, cut:] = True
        else:  # horizontal cut
            cut = int(rng.integers(ys.min(), max(ys.max(), ys.min() + 1) + 1))
            half = np.zeros_like(m)
            if rng.random() < 0.5:
                half[:cut, :] = True
            else:
                half[cut:, :] = True
        m = m & ~half
    out = img.copy()
    out[~m] = bg[~m]
    return out
