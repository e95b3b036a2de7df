"""Temporal-fingerprint video tests (operators/videohash.py): AVI
container roundtrip through the real RIFF parser, DIB layout edges
(stride padding, top-down, 32-bit), refusal modes, the real
frame_sample path, per-frame upscale invariance, slot sampling, and
brute-force candidate parity."""

import struct

import numpy as np
import pytest

from pystreams_spark.operators.imagehash import dhash_from_pixels
from pystreams_spark.operators.videohash import (
    _dib_to_rgb,
    decode_video_frames,
    encode_avi,
    video_frame_hashes,
    video_neardup_candidates,
)


def _frames(seed: int, n: int = 4, h: int = 6, w: int = 11):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for _ in range(n)
    ]


def test_avi_roundtrip_pixel_exact():
    frames = _frames(1)
    out, usec, w, h = decode_video_frames(encode_avi(frames, 40_000))
    assert (len(out), usec, w, h) == (4, 40_000, 11, 6)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_avi_roundtrip_padded_stride():
    # width 10 → 30-byte rows pad to 32: the 4-byte-alignment path
    frames = _frames(2, n=3, h=5, w=10)
    out, _, w, h = decode_video_frames(encode_avi(frames))
    assert (w, h) == (10, 5)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_dib_topdown_and_32bit():
    fr = _frames(3, n=1)[0]
    stride = (11 * 3 + 3) & ~3
    bu = np.zeros((6, stride), np.uint8)
    bu[:, : 11 * 3] = np.ascontiguousarray(fr[::-1, :, ::-1]).reshape(6, -1)
    td = np.zeros((6, stride), np.uint8)
    td[:, : 11 * 3] = np.ascontiguousarray(fr[:, :, ::-1]).reshape(6, -1)
    assert np.array_equal(_dib_to_rgb(bu.tobytes(), 11, 6, 24), fr)
    assert np.array_equal(_dib_to_rgb(td.tobytes(), 11, -6, 24), fr)
    # 32-bit BGRX (no row padding needed: 44 bytes is 4-aligned)
    bgrx = np.zeros((6, 11, 4), np.uint8)
    bgrx[..., :3] = fr[::-1, :, ::-1]
    bgrx[..., 3] = 255
    assert np.array_equal(_dib_to_rgb(bgrx.tobytes(), 11, 6, 32), fr)


def test_refusals_name_the_missing_codec():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_video_frames(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_video_frames(b"\x1a\x45\xdf\xa3" + b"\x00" * 16)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_video_frames(b"not a container")
    avi = encode_avi(_frames(4))
    idx = avi.find(struct.pack("<IiiHHI", 40, 11, 6, 1, 24, 0))
    patched = (
        avi[: idx + 16]
        + struct.pack("<I", int.from_bytes(b"MJPG", "little"))
        + avi[idx + 20 :]
    )
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_video_frames(patched)


def test_frame_sample_real_avi_path(spark):
    from pyspark.sql import Row

    from pystreams_spark.operators.multimodal import (
        decode_image_pixels,
        frame_sample,
    )

    frames = _frames(5)
    avi = encode_avi(frames, 500_000)  # 4 × 500 ms = 2 s of timeline
    df = spark.createDataFrame(
        [
            Row(
                media_id=7,
                payload=bytearray(avi),
                meta=Row(
                    uri="x", mime="video/avi", width=11, height=6,
                    duration_ms=2000,
                ),
            )
        ]
    )
    rows = sorted(
        frame_sample(df, every_ms=1000).collect(), key=lambda r: r.frame_idx
    )
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [(0, 0), (1, 1000)]
    # ts 0 → frame 0, ts 1000 ms → frame 2 (at-or-before, 500 ms/frame)
    assert np.array_equal(decode_image_pixels(bytes(rows[0].frame)), frames[0])
    assert np.array_equal(decode_image_pixels(bytes(rows[1].frame)), frames[2])


def test_frame_sample_corrupt_avi_falls_back_to_stub(spark):
    """ADVICE r10: an AVI-magic payload that fails real decode
    (truncated container here) must degrade to the byte-slice stub
    under decode_stub=True — one corrupt clip cannot kill the job —
    and raise by name under decode_stub=False."""
    from pyspark.sql import Row

    from pystreams_spark.operators.multimodal import frame_sample

    truncated = encode_avi(_frames(5), 500_000)[:40]  # RIFF/AVI magic kept
    df = spark.createDataFrame(
        [
            Row(
                media_id=9,
                payload=bytearray(truncated),
                meta=Row(
                    uri="x", mime="video/avi", width=11, height=6,
                    duration_ms=2000,
                ),
            )
        ]
    )
    rows = frame_sample(df, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in sorted(rows, key=lambda r: r.frame_idx)] \
        == [0, 1000]  # stub path: meta duration drives the timeline
    with pytest.raises(Exception):
        frame_sample(df, every_ms=1000, decode_stub=False).collect()


def test_decode_one_reports_video_features():
    from pystreams_spark.operators.multimodal import _decode_one

    out = _decode_one(encode_avi(_frames(6), 40_000), thumb_grid=4)
    assert out["kind"] == "video"
    assert (out["width"], out["height"]) == (11, 6)
    assert out["duration_ms"] == 160  # 4 × 40 ms


def test_video_hashes_upscale_invariant(spark):
    frames = _frames(7)
    big = [np.repeat(np.repeat(f, 2, axis=0), 2, axis=1) for f in frames]
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_avi(frames))),
            (2, bytearray(encode_avi(big))),
        ],
        "doc_id long, payload binary",
    )
    got = {
        (r.doc_id, r.slot): r.fhash
        for r in video_frame_hashes(df, n_slots=4).collect()
    }
    for s in range(4):
        assert got[(1, s)] == got[(2, s)] == dhash_from_pixels(frames[s])


def test_video_hashes_floor_boundary_slots(spark):
    frames = _frames(8, n=8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames)))], "doc_id long, payload binary"
    )
    got = {
        r.slot: r.fhash for r in video_frame_hashes(df, n_slots=4).collect()
    }
    # slot s → frame s·8//4 = 0, 2, 4, 6
    for s, fi in enumerate((0, 2, 4, 6)):
        assert got[s] == dhash_from_pixels(frames[fi])


def test_video_hashes_undecodable_modes(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_avi(_frames(9)))),
            (2, bytearray(b"not video at all")),
            # decodes fine but the 3x2 frames are smaller than the
            # hash grid: decode-ok-hash-fail must degrade to EXACTLY
            # one NULL row — never partial slot rows that would bias
            # total_hamming low downstream (ADVICE r10)
            (3, bytearray(encode_avi(_frames(5, h=2, w=3)))),
        ],
        "doc_id long, payload binary",
    )
    kept = video_frame_hashes(df, on_undecodable="keep").collect()
    by_id: dict = {}
    for r in kept:
        by_id.setdefault(r.doc_id, []).append(r.fhash)
    assert len(by_id[1]) == 4 and all(v is not None for v in by_id[1])
    assert by_id[2] == [None]
    assert by_id[3] == [None]
    with pytest.raises(Exception, match="RIFF/AVI|hash grid"):
        video_frame_hashes(df, on_undecodable="error").collect()


def test_video_candidates_match_bruteforce(spark):
    rows = []
    for did in range(16):
        frames = _frames(200 + did // 4)
        if did % 4:
            frames = [f.copy() for f in frames]
            # invert one cell in one id-dependent frame: a small edit
            f, c = did % 4 - 1, (did * 7) % 66
            frames[f][c // 11, c % 11] = 255 - frames[f][c // 11, c % 11]
        rows.append((did, bytearray(encode_avi(frames))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = video_frame_hashes(df, n_slots=4)
    got = {
        (r.id_a, r.id_b): r.total_hamming
        for r in video_neardup_candidates(
            hashes, max_total_hamming=10
        ).collect()
    }
    sigs: dict = {}
    for r in hashes.collect():
        sigs.setdefault(r.doc_id, {})[r.slot] = r.fhash

    def total(a, b):
        return sum(
            bin(sigs[a][s] ^ sigs[b][s]).count("1") for s in range(4)
        )

    for (a, b), hm in got.items():
        assert hm == total(a, b) and hm <= 10
    for a in sigs:
        for b in sigs:
            # pigeonhole per slot: some slot within Hamming < 4 collides
            if a < b and any(
                bin(sigs[a][s] ^ sigs[b][s]).count("1") < 4 for s in range(4)
            ):
                if total(a, b) <= 10:
                    assert (a, b) in got
    # partition independence
    got2 = {
        (r.id_a, r.id_b): r.total_hamming
        for r in video_neardup_candidates(
            video_frame_hashes(df.repartition(7), n_slots=4),
            max_total_hamming=10,
        ).collect()
    }
    assert got2 == got
    # facade parity: Stream.video_neardup_candidates is the same plan
    from pystreams_spark.stream import Stream

    got3 = {
        (r.id_a, r.id_b): r.total_hamming
        for r in Stream(df).video_neardup_candidates().df.collect()
    }
    assert got3 == got


def test_decode_totality_under_corruption():
    """One corrupt payload must degrade, never kill an ingest task:
    random bit flips over a valid container and a crafted LIST-nest
    bomb both surface as ValueError/NotImplementedError — no
    struct.error, RecursionError, or anything else escapes (the
    on_undecodable='keep' contract)."""
    import random

    rng = random.Random(0)
    base = encode_avi([np.zeros((6, 11, 3), np.uint8)] * 2)
    for _ in range(3000):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_video_frames(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    inner = b""
    for _ in range(5000):
        inner = (
            b"LIST" + (len(inner) + 4).to_bytes(4, "little") + b"rec " + inner
        )
    bomb = b"RIFF" + (len(inner) + 4).to_bytes(4, "little") + b"AVI " + inner
    with pytest.raises(ValueError, match="nesting"):
        decode_video_frames(bomb)
