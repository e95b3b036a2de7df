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
