"""Perceptual-hash image near-dup tests (operators/imagehash.py):
invariance to resize/re-encode, edit tolerance, brute-force candidate
parity, refusal modes, partitioning independence."""

import struct

import numpy as np
import pytest

from pystreams_spark.operators.imagehash import (
    dhash_from_pixels,
    image_dhash,
    image_dhash_candidates,
)


def _bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP of an H×W×3 RGB array."""
    h, w = arr.shape[:2]
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            row += bytes([b, g, r])
        row += b"\x00" * ((4 - len(row) % 4) % 4)
        rows.append(bytes(row))
    pixels = b"".join(reversed(rows))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    return struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54) + info + pixels


def _ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return f"P6 {w} {h} 255\n".encode() + arr.astype(np.uint8).tobytes()


def _rand_img(seed: int, h: int = 12, w: int = 22) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_dhash_invariant_to_pixel_doubling():
    img = _rand_img(1)
    up = np.repeat(np.repeat(img, 3, axis=0), 3, axis=1)  # 3x upscale
    assert dhash_from_pixels(img) == dhash_from_pixels(up)


def test_dhash_invariant_to_lossless_reencode(spark):
    img = _rand_img(2)
    df = spark.createDataFrame(
        [(1, bytearray(_bmp(img))), (2, bytearray(_ppm(img)))],
        "doc_id long, payload binary",
    )
    sigs = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    assert sigs[1] == sigs[2] == dhash_from_pixels(img)


def test_dhash_small_edit_small_hamming_unrelated_far():
    base = _rand_img(3, h=6, w=11)
    edited = base.copy()
    edited[2, 4] = 255 - edited[2, 4]  # one-cell inversion
    other = _rand_img(4, h=6, w=11)
    d_edit = bin(dhash_from_pixels(base) ^ dhash_from_pixels(edited)).count("1")
    d_other = bin(dhash_from_pixels(base) ^ dhash_from_pixels(other)).count("1")
    assert d_edit <= 2  # one cell touches at most its two comparisons
    assert d_other > 8  # md5-independent grids sit near 30 bits apart


def test_dhash_refuses_sub_grid_images():
    with pytest.raises(ValueError, match="smaller than the"):
        dhash_from_pixels(_rand_img(5, h=4, w=11))


def test_image_dhash_undecodable_modes(spark):
    rows = [(1, bytearray(_bmp(_rand_img(6)))), (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    kept = {r.doc_id: r.dhash for r in image_dhash(df, on_undecodable="keep").collect()}
    assert kept[1] is not None and kept[2] is None
    with pytest.raises(Exception, match="not a recognized image"):
        image_dhash(df, on_undecodable="error").collect()


def test_candidates_match_bruteforce_and_partitioning(spark):
    # 6 groups of 3 near-identical images (one-cell edits) + noise imgs
    rows = []
    for did in range(24):
        img = _rand_img(100 + did // 3)
        if did % 3:
            img = img.copy()
            img[did % 12, did % 22] = 255 - img[did % 12, did % 22]
        rows.append((did, bytearray(_bmp(img))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = image_dhash(df)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_dhash_candidates(sig, max_hamming=8).collect()
    }
    sigs = {r.doc_id: r.dhash for r in sig.collect()}

    def ham(a, b):
        return bin(sigs[a] ^ sigs[b]).count("1")

    # every returned pair is a true <=8 pair; every pair under the
    # pigeonhole bound (hamming < bands = 4) MUST be returned
    for (a, b), hm in got.items():
        assert hm == ham(a, b) and hm <= 8
    for a in sigs:
        for b in sigs:
            if a < b and ham(a, b) < 4:
                assert (a, b) in got
    # same-group neighbours are near
    assert all(ham(3 * g, 3 * g + 1) <= 4 for g in range(6))
    # partitioning independence
    got7 = {
        (r.id_a, r.id_b): r.hamming
        for r in image_dhash_candidates(
            image_dhash(df.repartition(7)), max_hamming=8
        ).collect()
    }
    assert got7 == got
