"""Native (C) host-side kernels with pure-python fallbacks.

Build in place with:  python setup.py build_ext --inplace
The loader auto-builds on first import when a compiler is available.
"""

from __future__ import annotations

import logging
import os.path as osp
import subprocess
import sys

import numpy as np

logger = logging.getLogger(__name__)

_rle = None


def _try_import():
    global _rle
    if _rle is not None:
        return _rle
    try:
        from . import _catre_rle as _rle_mod  # type: ignore

        _rle = _rle_mod
        return _rle
    except ImportError:
        pass
    # attempt an in-place build once
    repo_root = osp.normpath(osp.join(osp.dirname(__file__), "../.."))
    setup_py = osp.join(repo_root, "setup.py")
    if osp.exists(setup_py):
        try:
            subprocess.run(
                [sys.executable, setup_py, "build_ext", "--inplace"],
                cwd=repo_root, check=True, capture_output=True, timeout=120,
            )
            from . import _catre_rle as _rle_mod  # type: ignore

            _rle = _rle_mod
            logger.info("built native RLE codec")
            return _rle
        except Exception as e:
            logger.info("native RLE build failed (%s); using python fallback", e)
    _rle = False
    return _rle


def rle_decode_uncompressed(counts, h: int, w: int) -> np.ndarray:
    """counts -> (h, w) bool mask (column-major runs, zero-run first)."""
    mod = _try_import()
    if mod:
        buf = mod.decode_uncompressed(list(counts), h, w)
        return np.frombuffer(buf, dtype=np.uint8).reshape((h, w), order="F").astype(bool)
    # python fallback
    flat = np.zeros(h * w, dtype=bool)
    pos, val = 0, False
    for c in counts:
        if val:
            flat[pos: pos + c] = True
        pos += c
        val = not val
    return flat.reshape((h, w), order="F")


def rle_encode(mask: np.ndarray) -> list:
    """(h, w) mask -> counts (column-major, zero-run first)."""
    mod = _try_import()
    m = np.asfortranarray(np.asarray(mask, dtype=np.uint8))
    h, w = m.shape
    if mod:
        return mod.encode(m.tobytes(order="F"), h, w)
    flat = m.ravel(order="F")
    counts, prev, run = [], 0, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev = v
            run = 1
    counts.append(run)
    return counts


def rle_decode_coco_string(s: bytes, h: int, w: int) -> np.ndarray:
    """COCO compressed RLE byte string -> (h, w) bool mask."""
    if isinstance(s, str):
        s = s.encode("ascii")
    mod = _try_import()
    if mod:
        buf = mod.decode_coco_string(s, h, w)
        return np.frombuffer(buf, dtype=np.uint8).reshape((h, w), order="F").astype(bool)
    # python fallback (pycocotools rleFrString algorithm)
    counts = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return rle_decode_uncompressed(counts, h, w)
