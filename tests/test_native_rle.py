"""Native RLE codec: C extension vs python fallback vs known COCO encoding."""

import numpy as np

from catre_tpu import native

RNG = np.random.default_rng(23)


def _random_mask(h=123, w=77):
    m = np.zeros((h, w), dtype=bool)
    for _ in range(6):
        y, x = RNG.integers(0, h - 10), RNG.integers(0, w - 10)
        m[y : y + RNG.integers(2, 10), x : x + RNG.integers(2, 10)] = True
    return m


def test_roundtrip_native():
    assert native._try_import(), "native codec must build in this environment"
    for _ in range(5):
        m = _random_mask()
        counts = native.rle_encode(m)
        out = native.rle_decode_uncompressed(counts, *m.shape)
        np.testing.assert_array_equal(out, m)


def test_native_matches_python_fallback():
    m = _random_mask()
    counts_native = native.rle_encode(m)
    # force the python paths
    mod = native._rle
    native._rle = False
    try:
        counts_py = native.rle_encode(m)
        dec_py = native.rle_decode_uncompressed(counts_native, *m.shape)
    finally:
        native._rle = mod
    assert list(counts_native) == list(counts_py)
    dec_native = native.rle_decode_uncompressed(counts_native, *m.shape)
    np.testing.assert_array_equal(dec_native, dec_py)


def _coco_encode_string(counts):
    """Reference rleToString (pycocotools): 5-bit groups, continuation 0x20,
    delta from the 3rd index on."""
    s = bytearray()
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c5 = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c5 & 0x10)) and not (x == -1 and (c5 & 0x10))
            if more:
                c5 |= 0x20
            s.append(c5 + 48)
    return bytes(s)


def test_coco_string_decode():
    m = _random_mask(64, 48)
    counts = native.rle_encode(m)
    s = _coco_encode_string(counts)
    out = native.rle_decode_coco_string(s, 64, 48)
    np.testing.assert_array_equal(out, m)
    # python fallback agrees
    mod = native._rle
    native._rle = False
    try:
        out_py = native.rle_decode_coco_string(s, 64, 48)
    finally:
        native._rle = mod
    np.testing.assert_array_equal(out_py, m)


def test_decode_speed_sanity():
    """The native decoder must handle full 640x480 masks comfortably."""
    import time

    m = _random_mask(480, 640)
    counts = native.rle_encode(m)
    t0 = time.perf_counter()
    for _ in range(100):
        native.rle_decode_uncompressed(counts, 480, 640)
    dt = (time.perf_counter() - t0) / 100
    assert dt < 0.01, f"native decode too slow: {dt*1e3:.2f} ms"
