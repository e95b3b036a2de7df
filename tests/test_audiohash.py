"""Acoustic-fingerprint tests (operators/audiohash.py): volume and
mono→stereo invariance through the real WAV decoder, edit tolerance,
refusal modes, brute-force candidate parity."""

import struct

import numpy as np
import pytest

from pystreams_spark.operators.audiohash import (
    afp_from_samples,
    audio_fingerprint,
    audio_fingerprint_candidates,
)


def _wav(samples: np.ndarray, channels: int = 1, rate: int = 8000) -> bytes:
    """16-bit PCM WAV; ``samples`` is 1-D interleaved."""
    data = struct.pack(f"<{len(samples)}h", *[int(v) for v in samples])
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _contour(seed: int, windows: int = 61, per: int = 8) -> np.ndarray:
    rng = np.random.RandomState(seed)
    amps = rng.randint(1, 250, size=windows)
    out = []
    for a in amps:
        out.extend([a, -a] * (per // 2))
    return np.array(out, dtype=np.int64)


def test_afp_invariant_to_volume_and_stereo(spark):
    mono = _contour(1)
    louder = mono * 3  # exact re-leveling
    stereo = np.repeat(mono, 2)  # duplicate into L/R
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav(mono))),
            (2, bytearray(_wav(louder))),
            (3, bytearray(_wav(stereo, channels=2))),
        ],
        "doc_id long, payload binary",
    )
    sigs = {r.doc_id: r.afp for r in audio_fingerprint(df).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert sigs[1] == afp_from_samples(mono.reshape(-1, 1))


def test_afp_small_edit_small_hamming_unrelated_far():
    base = _contour(2)
    edited = base.copy()
    edited[8 * 10 : 8 * 11] = -edited[8 * 10 : 8 * 11] * 2  # re-level 1 window
    other = _contour(3)
    f = lambda s: afp_from_samples(s.reshape(-1, 1))
    assert bin(f(base) ^ f(edited)).count("1") <= 2
    assert bin(f(base) ^ f(other)).count("1") > 8


def test_afp_refuses_too_short():
    with pytest.raises(ValueError, match="shorter than"):
        afp_from_samples(np.zeros((10, 1), dtype=np.int16))


def test_audio_fingerprint_undecodable_modes(spark):
    rows = [
        (1, bytearray(_wav(_contour(4)))),
        (2, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    kept = {
        r.doc_id: r.afp
        for r in audio_fingerprint(df, on_undecodable="keep").collect()
    }
    assert kept[1] is not None and kept[2] is None
    with pytest.raises(Exception, match="RIFF/WAVE"):
        audio_fingerprint(df, on_undecodable="error").collect()


def test_audio_candidates_match_bruteforce(spark):
    rows = []
    for did in range(18):
        s = _contour(100 + did // 3)
        if did % 3:
            s = s.copy()
            w = (did * 5) % 61
            s[8 * w : 8 * (w + 1)] = -s[8 * w : 8 * (w + 1)] * 2
        rows.append((did, bytearray(_wav(s))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = audio_fingerprint(df)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_fingerprint_candidates(sig, max_hamming=8).collect()
    }
    sigs = {r.doc_id: r.afp for r in sig.collect()}

    def ham(a, b):
        return bin(sigs[a] ^ sigs[b]).count("1")

    for (a, b), hm in got.items():
        assert hm == ham(a, b) and hm <= 8
    for a in sigs:
        for b in sigs:
            if a < b and ham(a, b) < 4:  # pigeonhole bound
                assert (a, b) in got
