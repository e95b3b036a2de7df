"""Multimodal column plumbing: schema, Arrow batch shape, payload
pruning. Decoders are stubbed (no media libs in container); what's
tested is the real Spark-side machinery."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pystreams_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    frame_sample,
    media_stats,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        Row(
            media_id=i,
            payload=bytes([i % 251]) * (100 + i),
            meta=Row(
                uri=f"s3://bucket/obj{i}.mp4" if i % 2 else f"file:///img{i}.png",
                mime="video/mp4" if i % 2 else "image/png",
                width=640 + i,
                height=480,
                duration_ms=3000 if i % 2 else None,
            ),
        )
        for i in range(8)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_deterministic(media_df):
    out = decode_features(media_df, dim=16)
    rows = {r.media_id: r.features for r in out.collect()}
    rows2 = {r.media_id: r.features for r in decode_features(media_df, dim=16).collect()}
    assert rows == rows2
    assert all(len(v) == 16 for v in rows.values())
    # distinct payloads → distinct fake features
    assert rows[0] != rows[1]


def test_decode_stub_raises_for_real_path(media_df):
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|PIL"):
        decode_features(media_df, decode_stub=False).collect()


def test_frame_sample_explodes_video_rows(media_df):
    frames = frame_sample(media_df, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    by_id = {r.media_id: r["count"] for r in got}
    # videos (odd ids, 3000ms) → 3 frames; images (duration None) → 1
    assert by_id[1] == 3 and by_id[3] == 3
    assert by_id[0] == 1
    assert frames.schema["frame"].dataType.typeName() == "binary"


def test_media_stats_prunes_payload(media_df, tmp_path):
    path = str(tmp_path / "media")
    media_df.write.parquet(path)
    df = media_df.sparkSession.read.parquet(path)
    stats = media_stats(df)
    rows = {r.mime: r.n for r in stats.collect()}
    assert rows == {"video/mp4": 4, "image/png": 4}
    # the binary payload must be pruned from the parquet scan
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def _wav_bytes(freq=440, rate=8000, n=8000, amp=0.5):
    """Mono 16-bit PCM sine — RMS must come out ≈ amp/√2."""
    import struct

    import numpy as np

    t = np.arange(n) / rate
    samples = (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _bmp_bytes(w=6, h=4, rgb=(200, 100, 50)):
    """Uncompressed 24-bit solid-color BMP (bottom-up, padded rows)."""
    import struct

    row = bytes(reversed(rgb)) * w  # BGR per pixel
    pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    pixels = (row + pad) * h
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return header + info + pixels


def _ppm_bytes(w=5, h=3, rgb=(10, 20, 30)):
    return (f"P6\n# cmt\n{w} {h}\n255\n").encode() + bytes(rgb) * (w * h)


def test_real_decoders_extract_true_features(spark):
    """WAV/BMP/PPM payloads REALLY decode: sine RMS ≈ amp/√2, solid
    colors give exact channel means and a flat thumbnail; unknown
    magic bytes degrade to kind='undecodable' with the reason."""
    from pystreams_spark.operators.multimodal import decode_media_features

    rows = [
        (1, _wav_bytes()),
        (2, _bmp_bytes()),
        (3, _ppm_bytes()),
        (4, b"\x89PNG\r\n\x1a\n fake compressed payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_media_features(df).collect()}

    wav = out[1]
    assert wav.kind == "audio"
    assert wav.sample_rate == 8000 and wav.n_channels == 1
    assert wav.duration_ms == 1000
    assert abs(wav.rms - 0.5 / 2**0.5) < 0.01
    assert 0.05 < wav.zero_crossing_rate < 0.2  # 440 Hz at 8 kHz ≈ 0.11

    bmp = out[2]
    assert bmp.kind == "image" and (bmp.width, bmp.height) == (6, 4)
    assert (bmp.mean_r, bmp.mean_g, bmp.mean_b) == (200.0, 100.0, 50.0)
    gray = (200 + 100 + 50) / 3 / 255.0
    assert len(bmp.thumb) == 16 and all(abs(v - gray) < 1e-6 for v in bmp.thumb)

    ppm = out[3]
    assert ppm.kind == "image" and (ppm.width, ppm.height) == (5, 3)
    assert (ppm.mean_r, ppm.mean_g, ppm.mean_b) == (10.0, 20.0, 30.0)

    png = out[4]
    assert png.kind == "undecodable" and "PIL/ffmpeg" in png.decode_error
    # payload column must NOT survive into the output (narrow plan)
    assert "payload" not in out[1].asDict()


def test_real_decoder_strict_mode_raises(spark):
    import pytest as _pytest

    from pystreams_spark.operators.multimodal import decode_media_features

    df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff jpeg-ish")], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="undecodable payload"):
        decode_media_features(df, on_undecodable="error").collect()


def test_real_decoder_rejects_malformed_gracefully(spark):
    """Truncated/corrupt members of supported formats must yield
    undecodable rows (with reasons), never crash the batch."""
    from pystreams_spark.operators.multimodal import decode_media_features

    import struct

    # ≥44 bytes overall, but the fmt chunk body is cut off mid-struct:
    # unpack_from raises struct.error (NOT ValueError) — must degrade,
    # not kill the task
    cut_fmt = (
        b"RIFF" + struct.pack("<I", 44) + b"WAVE"
        + b"JUNK" + struct.pack("<I", 20) + b"\x00" * 20
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00"
    )
    rows = [
        (1, _bmp_bytes()[:30]),              # truncated BMP header
        (2, _wav_bytes()[:40]),              # truncated WAV
        (3, b"P6\n2 2\n255\n\x00"),          # truncated PPM pixels
        (4, _bmp_bytes()),                   # one good row in the batch
        (5, cut_fmt),                        # struct.error path
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_media_features(df).collect()}
    assert out[4].kind == "image"
    assert all(out[i].kind == "undecodable" for i in (1, 2, 3, 5))
    assert all(out[i].decode_error for i in (1, 2, 3, 5))
    assert "error" in out[5].decode_error.lower()
