"""Acoustic-fingerprint audio near-duplicate detection — a 60-bit
energy-contour hash over DECODED PCM samples, banded-Hamming candidate
generation (the audio sibling of ``operators/imagehash.py``).

Why: re-encoded / re-leveled copies of the same RECORDING are the
audio face of the scraped-corpus dup problem — exact-byte dedup sees
different containers, text dedup sees no text at all. The classic
cheap screen (the energy-difference contour underlying public audio
fingerprinting literature, e.g. the Haitsma–Kalker bit-derivation
idea applied to one band) hashes the SHAPE of the energy envelope:
one bit per adjacent-window energy comparison.

Integer-exact construction (this repo's oracle discipline):

* window energies are exact integer sums of squared raw PCM samples
  over floor-boundary windows (``window i spans [i·n//W, (i+1)·n//W)``);
* channel mixdown is the integer SUM across channels (not a rounded
  mean) — scaling all samples by c scales every energy by c², so the
  comparison bits are invariant to volume change AND to duplicating a
  mono track into identical stereo channels (energies ×4), both
  pinned in tests;
* bit j is 1 iff window j+1's mean energy exceeds window j's,
  compared cross-multiplied in arbitrary-precision Python ints
  (``E₂·n₁ > E₁·n₂``) — no float anywhere, bit-identical across
  engines and partitionings, SQL-replayable.

61 windows → 60 bits (the repo's signed-bigint-safe signature width);
candidates ride the shared ``dedup.banded_hamming_pairs`` (4×15-bit
bands, pigeonhole recall for Hamming < bands, bit_count-XOR verify).

Scale shape: one mapInPandas decode+hash pass (payloads never leave
the kernel; output is id + one long), then (band, value, id) triple
shuffles — no all-pairs term. Float-PCM inputs hash too (float64
energy sums), but the engine-exactness claim is for integer PCM; the
registered oracle query synthesizes 16-bit integer PCM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "afp_from_samples",
    "audio_fingerprint",
    "audio_fingerprint_candidates",
]


def afp_from_samples(samples2d, windows: int = 61) -> int:
    """60-bit energy-contour fingerprint of an (n, channels) raw PCM
    array (``windows`` − 1 bits; default 61 → 60). Integer-exact for
    integer dtypes; float PCM degrades to float64 energy sums (hash
    still deterministic on one engine, just not oracle-portable)."""
    import numpy as np

    n = int(samples2d.shape[0])
    if n < windows:
        raise ValueError(
            f"audio with {n} samples is shorter than the {windows}-window "
            "fingerprint grid"
        )
    if np.issubdtype(samples2d.dtype, np.integer):
        mix = samples2d.astype(np.int64).sum(axis=1)
        # uint8 PCM is unsigned with midpoint 128: center exactly
        if samples2d.dtype == np.uint8:
            mix = mix - 128 * samples2d.shape[1]
        maxabs = int(np.abs(mix).max()) if n else 0
        if maxabs * maxabs * n < (1 << 62):
            # fast exact path: squares AND window sums fit in int64
            # (covers 8/16-bit PCM of any practical length)
            sq = mix * mix
            energies = [
                int(sq[i * n // windows : (i + 1) * n // windows].sum())
                for i in range(windows)
            ]
        else:
            # int32 extremes: exact via arbitrary-precision Python ints
            energies = [
                sum(
                    int(v) * int(v)
                    for v in mix[i * n // windows : (i + 1) * n // windows]
                )
                for i in range(windows)
            ]
    else:
        mix = samples2d.astype(np.float64).sum(axis=1)
        sq = mix * mix
        energies = [
            float(sq[i * n // windows : (i + 1) * n // windows].sum())
            for i in range(windows)
        ]
    sizes = [(i + 1) * n // windows - i * n // windows for i in range(windows)]
    sig = 0
    for j in range(windows - 1):
        if energies[j + 1] * sizes[j] > energies[j] * sizes[j + 1]:
            sig |= 1 << j
    return sig


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    windows: int = 61,
    on_undecodable: str = "error",
) -> DataFrame:
    """Decode every WAV payload and attach its fingerprint —
    mapInPandas; output carries the non-payload columns +
    (afp, sample_rate, n_samples). ``on_undecodable='keep'`` degrades
    failures to NULL rows; ``'error'`` (default) raises naming the
    first failure."""
    import pandas as pd

    from .multimodal import decode_audio_samples

    keep = [f for f in df.schema.fields if f.name != payload_col]
    keep_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keep
    )
    extra = "afp bigint, sample_rate int, n_samples bigint"
    schema = f"{keep_ddl}, {extra}" if keep_ddl else extra
    keep_names = [f.name for f in keep]

    def kernel(batches):
        for pdf in batches:
            sigs: list = []
            meta: list = []
            for b in pdf[payload_col]:
                try:
                    s2d, rate, _, _ = decode_audio_samples(
                        bytes(b) if b is not None else b""
                    )
                    sigs.append(afp_from_samples(s2d, windows))
                    meta.append((rate, int(s2d.shape[0])))
                except Exception:
                    # named refusals AND truncated-chunk struct.error
                    # both degrade in keep mode (one corrupt payload
                    # must not fail a 100 TB ingest task); error mode
                    # surfaces everything
                    if on_undecodable == "error":
                        raise
                    sigs.append(None)
                    meta.append((None, None))
            out = pdf[keep_names].reset_index(drop=True)
            out["afp"] = pd.Series(sigs, dtype="object")
            out["sample_rate"] = pd.Series([m[0] for m in meta], dtype="object")
            out["n_samples"] = pd.Series([m[1] for m in meta], dtype="object")
            yield out

    return df.mapInPandas(kernel, schema)


def audio_fingerprint_candidates(
    sig: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "afp",
    bands: int = 4,
    band_bits: int = 15,
    max_hamming: int = 8,
) -> DataFrame:
    """Banded-Hamming near-dup candidates over a fingerprint column —
    (id_a, id_b, hamming ≤ ``max_hamming``) via the shared
    ``dedup.banded_hamming_pairs``; NULL fingerprints dropped."""
    from .dedup import banded_hamming_pairs

    clean = sig.filter(F.col(sig_col).isNotNull()).select(id_col, sig_col)
    clean = clean.localCheckpoint(eager=True)
    return banded_hamming_pairs(
        clean,
        id_col=id_col,
        sig_col=sig_col,
        bands=bands,
        band_bits=band_bits,
        max_hamming=max_hamming,
    )
