"""Perceptual-hash image near-duplicate detection — dHash (difference
hash) over DECODED pixels, banded-Hamming candidate generation.

The one LLM-pipeline dedup axis text and embedding dedup cannot see:
re-encoded / resized copies of the same IMAGE are endemic in scraped
corpora (the same photo served as BMP, PNG, JPEG, WebP, at several
sizes), and none of the byte-level exact dedup, the text MinHash, or
the embedding-cosine screens notice them. dHash (the "difference
hash" described publicly by N. Krawetz, and the gradient-hash family
in the public pHash literature) is the standard cheap screen: a tiny
grayscale grid, one bit per horizontally-adjacent cell comparison —
invariant to scale, aspect-preserving resize, and any lossless
re-encode, tolerant (small Hamming distance) to mild edits.

Design constraints inherited from this repo's oracle discipline:

* INTEGER-EXACT everywhere. Grayscale is the integer ITU weighting
  ``1000·gray = 299·R + 587·G + 114·B`` (no float), box downsampling
  keeps exact integer box SUMS over floor-boundary grids, and the
  cell comparison cross-multiplies sums by areas instead of dividing
  (``S₂·A₁ > S₁·A₂``) — so the 60-bit signature is a pure function of
  the pixel grid, bit-identical across engines, partitionings, and
  library versions, and a DuckDB oracle can replay it.
* 60-bit signatures (6 rows × 10 comparisons on an 11×6 grid) — the
  repo's signed-bigint-safe width (same as the SimHash / MinHash
  anchors), split into 4×15-bit bands by the shared
  ``dedup.banded_hamming_pairs`` machinery.
* Decoding reuses ``multimodal.decode_image_pixels`` — the SAME
  oracle-grade decoders ``media_decode_report`` certifies (every T.81
  JPEG process, PNG, BMP, PPM, GIF, TIFF, WebP VP8L), so "hash the
  image" means "hash what the bytes actually decode to", not a
  format-dependent byte prefix.

Scale shape: one mapInPandas pass over the binary column (Arrow
batches; payloads never leave the kernel — the output is id + one
long), then the banded join shuffles (band, value, id) triples. No
all-pairs term anywhere; cost is linear in images + Σ band-bucket².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dhash_from_pixels", "image_dhash", "image_dhash_candidates"]


def dhash_from_pixels(arr, h_cells: int = 6, w_cells: int = 11) -> int:
    """60-bit dHash of an H×W×3 uint8 RGB array, integer-exact.

    Grid: ``h_cells`` × ``w_cells`` boxes with floor boundaries
    (``row i spans [i·H//h, (i+1)·H//h)``). Bit ``i·(w_cells−1)+j`` is
    1 iff box (i, j+1)'s mean gray exceeds box (i, j)'s — compared as
    ``S₂·A₁ > S₁·A₂`` in arbitrary-precision Python ints so no image
    size can overflow or round. A k× pixel-duplication upscale scales
    every box sum and area by k², leaving every comparison — hence the
    hash — EXACTLY unchanged (pinned in tests); lossless re-encodes
    are identical pixels, hence identical hashes.
    """
    import numpy as np

    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h < h_cells or w < w_cells:
        raise ValueError(
            f"image {w}x{h} smaller than the {w_cells}x{h_cells} hash grid"
        )
    a = arr.astype(np.int64)
    gray = 299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]
    rb = [i * h // h_cells for i in range(h_cells + 1)]
    cb = [j * w // w_cells for j in range(w_cells + 1)]
    # exact box sums via the integral image (int64 is exact here:
    # 255000·H·W < 2^63 for any image under ~190 gigapixels)
    ii = gray.cumsum(axis=0).cumsum(axis=1)

    def box(i: int, j: int) -> tuple[int, int]:
        r0, r1, c0, c1 = rb[i], rb[i + 1], cb[j], cb[j + 1]
        s = int(ii[r1 - 1, c1 - 1])
        if r0 > 0:
            s -= int(ii[r0 - 1, c1 - 1])
        if c0 > 0:
            s -= int(ii[r1 - 1, c0 - 1])
        if r0 > 0 and c0 > 0:
            s += int(ii[r0 - 1, c0 - 1])
        return s, (r1 - r0) * (c1 - c0)

    sig = 0
    for i in range(h_cells):
        s_prev, a_prev = box(i, 0)
        for j in range(w_cells - 1):
            s_next, a_next = box(i, j + 1)
            if s_next * a_prev > s_prev * a_next:
                sig |= 1 << (i * (w_cells - 1) + j)
            s_prev, a_prev = s_next, a_next
    return sig


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    h_cells: int = 6,
    w_cells: int = 11,
    on_undecodable: str = "error",
) -> DataFrame:
    """Decode every image payload and attach its 60-bit dHash —
    mapInPandas (Arrow batches), payloads consumed inside the kernel;
    output carries the non-payload columns + (dhash, width, height).

    ``on_undecodable='keep'`` degrades failed payloads to a NULL dhash
    row (ingest mode); ``'error'`` raises naming the first failure
    (strict mode, the default — a dedup screen silently skipping
    images is a silent recall hole).
    """
    import pandas as pd

    from .multimodal import decode_image_pixels

    keep = [f for f in df.schema.fields if f.name != payload_col]
    keep_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keep
    )
    extra = "dhash bigint, width int, height int"
    schema = f"{keep_ddl}, {extra}" if keep_ddl else extra
    keep_names = [f.name for f in keep]

    def kernel(batches):
        for pdf in batches:
            sigs: list = []
            dims: list = []
            for b in pdf[payload_col]:
                try:
                    arr = decode_image_pixels(
                        bytes(b) if b is not None else b""
                    )
                    sigs.append(dhash_from_pixels(arr, h_cells, w_cells))
                    dims.append((int(arr.shape[1]), int(arr.shape[0])))
                except Exception:
                    # ValueError/NotImplementedError are the named
                    # refusals; struct.error / zlib.error / IndexError
                    # on truncated bytes land here too — one corrupt
                    # payload must not fail a 100 TB ingest task
                    # (keep mode); error mode surfaces everything
                    if on_undecodable == "error":
                        raise
                    sigs.append(None)
                    dims.append((None, None))
            out = pdf[keep_names].reset_index(drop=True)
            out["dhash"] = pd.Series(sigs, dtype="object")
            out["width"] = pd.Series([d[0] for d in dims], dtype="object")
            out["height"] = pd.Series([d[1] for d in dims], dtype="object")
            yield out

    return df.mapInPandas(kernel, schema)


def image_dhash_candidates(
    sig: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "dhash",
    bands: int = 4,
    band_bits: int = 15,
    max_hamming: int = 8,
) -> DataFrame:
    """Banded-Hamming near-dup candidates over a dHash column —
    (id_a, id_b, hamming) with hamming ≤ ``max_hamming``; rides the
    shared ``dedup.banded_hamming_pairs`` (the SimHash anchor's exact
    machinery: 4×15-bit bands, pigeonhole recall for distance < bands,
    bit_count-XOR verify). NULL signatures (undecodable payloads under
    ``on_undecodable='keep'``) are dropped before banding."""
    from .dedup import banded_hamming_pairs

    clean = sig.filter(F.col(sig_col).isNotNull()).select(id_col, sig_col)
    # three consumers (two band sides + verify) — pin the kernel output
    # so the decode+hash pass runs once
    clean = clean.localCheckpoint(eager=True)
    return banded_hamming_pairs(
        clean,
        id_col=id_col,
        sig_col=sig_col,
        bands=bands,
        band_bits=band_bits,
        max_hamming=max_hamming,
    )
