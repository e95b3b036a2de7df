"""Event-time analytics (SURVEY.md §2.I): tumbling / sliding / session
windows, expressed once and usable identically in batch and Structured
Streaming (the F.window/session_window expressions are the same; only
the source/sink differ).

Batch-first (oracle-checkable); the streaming entry points wrap the same
functions around a file stream + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    duration: str,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window aggregate; window start surfaces as bucket_start."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("_w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("_w")["start"].alias("bucket_start"), *keys, "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    duration: str,
    slide: str,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding-window aggregate: each event lands in duration/slide
    overlapping windows."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("_w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("_w")["start"].alias("bucket_start"), *keys, "n_events", "sum_value")
    )


def sessionize(
    events: DataFrame,
    gap: str,
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: events of one key belong to the same session while
    consecutive gaps stay strictly under ``gap``."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("_w"), key)
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end_last"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(key, "session_start", "session_end_last", "n_events", "sum_value")
    )


# -- Structured Streaming wrappers ------------------------------------------


def events_file_stream(
    spark: SparkSession, src_dir: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replay a parquet directory as a stream (fixture replay source)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def streaming_tumbling_counts(
    stream: DataFrame,
    duration: str,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Same tumbling aggregate under a watermark: late events beyond
    ``watermark`` are dropped and window state is evictable — the knob
    that bounds state size on an unbounded 100 TB/day stream."""
    return tumbling_counts(
        stream.withWatermark(ts_col, watermark), duration, ts_col, keys
    )


def streaming_dedup(
    stream: DataFrame, keys: list[str], watermark: str, ts_col: str = "ts"
) -> DataFrame:
    """Streaming exact-dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    spark: SparkSession,
    output_mode: str = "complete",
) -> None:
    """Drain an availableNow stream into an in-memory table (tests).
    ``output_mode='complete'`` fits aggregation queries; pass
    ``'append'`` for non-aggregated streams (dedup, map-only, joins) —
    complete mode is illegal for those."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals_stateful(stream: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Arbitrary stateful streaming op (applyInPandasWithState): per-user
    running event count + value total maintained in keyed state across
    micro-batches — the custom-operator escape hatch when windowed
    aggregates can't express the logic (SURVEY §2.I).

    State per key is two numbers; with watermark-driven timeouts the
    state store stays bounded on unbounded streams.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Same running per-user totals on the Spark 4.x transformWithState
    API (StatefulProcessor + typed ValueState): the successor to
    applyInPandasWithState — composable state variables, per-state TTL,
    and timers. Kept alongside the classic variant so both §2.I custom
    stateful surfaces exist.

    Environment note: the TWS state protocol requires ``google.protobuf``
    (not installed in this container), so its test skips with the real
    error when the import is missing; ``running_user_totals_stateful``
    (applyInPandasWithState) is the equivalence-tested path here.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState requires the RocksDB state store
    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def purchases_after_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: purchases attributed to a
    click by the same user within ``within``. Both sides buffer only a
    watermark-bounded window of rows — the state-store contract that
    makes stream-stream joins viable on unbounded input. The identical
    expression works in batch (watermarks ignored).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond).select(
        "c_user", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value"
    )


def funnel_progress_stateful(
    stream: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Streaming funnel tracker (applyInPandasWithState): per-user keyed
    state = (deepest stage reached, event time it was reached). Each
    micro-batch advances the chain greedily in event-time order: an
    event advances the funnel iff it is the NEXT stage and strictly
    later than the current stage's timestamp — exactly the batch
    funnel's first-view → first-later-click → first-later-purchase
    chain, provided delivery is event-time-ordered ACROSS batches (the
    kappa-architecture contract: a time-ordered, user-keyed log; within
    a batch the processor sorts by ts itself). State per user is one
    int + one timestamp — bounded regardless of stream length.
    Emits the current (user_id, stage_reached, reached_ts) per batch;
    in update mode the last row per user is the final funnel position.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stage_idx = {s: i for i, s in enumerate(stages)}

    def update(key, pdfs, state):
        import pandas as pd

        reached, reached_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for etype, ts in zip(pdf["event_type"], pdf["ts"]):
                if reached >= len(stages):
                    break
                nxt = stage_idx.get(etype)
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if nxt == reached and (reached == 0 or ts_us > reached_us):
                    reached += 1
                    reached_us = ts_us
        state.update((reached, reached_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage_reached": [reached],
                "reached_us": [reached_us],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, stage_reached int, reached_us long",
        stateStructType="reached int, reached_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
