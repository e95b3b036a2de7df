"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.K).

Payloads are opaque ``binary`` columns with a typed metadata struct —
the parquet-native layout for 100 TB multimodal corpora (bytes stay
columnar, metadata prunes without touching payloads).

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the
decode kernels are stubbed: ``decode_stub=True`` produces deterministic
fake features (hash-derived), and the real import path raises
NotImplementedError. Everything Spark-side — schema, Arrow batch shape,
partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("uri", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def read_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Ingest raw files as (path, modificationTime, length, content) —
    Spark's binaryFile source; content is the opaque payload column."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: hash-seeded values."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    dim: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode payload → feature vector via mapInPandas (Arrow batches).

    Real decoders plug in by replacing the per-batch kernel; the Spark
    plumbing (schema growth, batch iteration, partition preservation) is
    identical. Stub features are deterministic in the payload bytes.
    """
    out_schema = StructType(df.schema.fields + [StructField(out_col, ArrayType(FloatType()))])

    def kernel(batches):
        for pdf in batches:
            if decode_stub:
                pdf[out_col] = pdf[payload_col].map(lambda b: _fake_feature(bytes(b or b""), dim))
            else:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this container"
                )
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    meta_col: str = "meta",
    decode_stub: bool = True,
) -> DataFrame:
    """Sample video payloads into per-frame rows (1→N via mapInPandas).

    Output: (media_id, frame_idx, frame_ts_ms, frame BinaryType). Stub
    slices the payload bytes deterministically per frame index.
    """
    import pandas as pd

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if not decode_stub:
                    raise NotImplementedError("real frame extraction needs ffmpeg")
                duration = (r[meta_col]["duration_ms"] or 0) if r[meta_col] is not None else 0
                payload = bytes(r[payload_col] or b"")
                for i, ts in enumerate(range(0, max(int(duration), 1), every_ms)):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_ts_ms": ts,
                            "frame": payload[i % max(len(payload), 1) :][:16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"])

    return df.mapInPandas(kernel, out_schema)


def media_stats(df: DataFrame, meta_col: str = "meta") -> DataFrame:
    """Metadata-only aggregate — touches no payload bytes, so column
    pruning keeps the (huge) binary column out of the scan entirely
    (verify via .explain: ReadSchema excludes payload)."""
    return df.groupBy(F.col(f"{meta_col}.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col(f"{meta_col}.width").cast("double")).alias("avg_width"),
        F.avg(F.col(f"{meta_col}.duration_ms").cast("double")).alias(
            "avg_duration_ms"
        ),
    )
