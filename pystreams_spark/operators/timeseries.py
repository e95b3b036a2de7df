"""Time-series regularization: resample an irregular event stream onto
a fixed grid per series, with gap semantics a downstream model can rely
on (forward-fill and linear interpolation) — the standard "sensor /
metrics / activity" preprocessing step relational engines leave to the
user.

Scale shape: everything is per-series. The aggregate is one partial-
agg'd groupBy; the grid is generated per key from that aggregate's own
min/max (a `sequence` explode — no driver work, no global range); the
fill windows are all ``partitionBy(keys)``, so there is no
single-partition exchange anywhere (`plans.lint` clean — a global
series would be the classic Window cliff; give it a key, even a
constant bucket of series ids).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import avg_round_half_up

__all__ = ["resample_fill", "transition_counts"]


def resample_fill(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    key_cols: Sequence[str],
    step_seconds: int,
    agg: str = "avg",
    round_to: int = 6,
    avg_contract: str | None = None,
) -> DataFrame:
    """Resample ``val_col`` onto a ``step_seconds`` grid per key.

    Returns one row per (keys, bucket) over each key's [min, max]
    bucket span with:

    - ``bucket``: grid epoch seconds (long),
    - ``raw``: the bucket's aggregate, NULL on empty buckets,
    - ``ffill``: last observation carried forward,
    - ``interp``: linear interpolation between the neighboring
      observations (equals ``raw`` on observed buckets; falls back to
      ffill after the last observation and backfill before the first).

    ``avg_contract``: by default the bucket aggregate is plain
    ``ROUND(agg(x), round_to)``. Passing ``"micros_half_up"`` (valid
    only with ``agg='avg'``) switches the average to the engine-exact
    integer-scaled half-up contract (``functions/exact``): each value
    is quantized to ``10^-round_to`` units BEFORE summing, so the
    rounded average is reproducible across engines and partitionings —
    at the cost of diverging from round-after-average for inputs with
    more than ``round_to`` significant decimals (e.g. values
    [3e-7, 3e-7, 9e-7] average to 0.0 under the contract vs 0.000001
    under ``round(avg, 6)``). r11 made this implicit for
    ``agg='avg', round_to=6``; r12 gates it on this explicit parameter
    (ADVICE r11) so generic callers get the unsurprising default.
    """
    if not key_cols:
        raise ValueError(
            "resample_fill needs at least one key column: a keyless global "
            "series forces every row through one task (single-partition "
            "window). Shard the series or add a constant-bucket key "
            "explicitly upstream if it is genuinely one series."
        )
    if avg_contract not in (None, "micros_half_up"):
        raise ValueError(
            f"resample_fill: unknown avg_contract {avg_contract!r} "
            "(expected None or 'micros_half_up')"
        )
    if avg_contract == "micros_half_up" and agg != "avg":
        raise ValueError(
            "resample_fill: avg_contract='micros_half_up' only applies "
            f"to agg='avg' (got agg={agg!r})"
        )
    keys = [F.col(k) for k in key_cols]
    step = int(step_seconds)
    agg_fn = getattr(F, agg)

    # floor, not cast-truncate: truncation rounds toward zero, which
    # would shift every pre-1970 bucket one step late
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    # the contract average (r11: the sf0.1 parity sweep caught a real
    # ROUND(AVG) half-case — 27.271667 vs 27.271666 over a 12-value
    # bucket whose float sum order differs between engines); see the
    # avg_contract docstring for the semantics trade-off
    if avg_contract == "micros_half_up":
        raw_agg = avg_round_half_up("_v", round_to)
    else:
        raw_agg = F.round(agg_fn("_v"), round_to)
    observed = (
        df.select(*keys, bucket.alias("bucket"), F.col(val_col).alias("_v"))
        .groupBy(*key_cols, "bucket")
        .agg(raw_agg.alias("raw"))
        # both the grid span and the left join consume this aggregate —
        # materialize once instead of re-running the corpus scan+shuffle
        # through two lineages of one plan
        .localCheckpoint(eager=True)
    )
    grid = (
        observed.groupBy(*key_cols)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
            ).alias("bucket"),
        )
    )
    filled = grid.join(observed, [*key_cols, "bucket"], "left")

    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("raw").isNotNull(), F.col("bucket"))
    prev_v = F.last("raw", ignorenulls=True).over(w_prev)
    next_v = F.first("raw", ignorenulls=True).over(w_next)
    prev_t = F.last(obs_t, ignorenulls=True).over(w_prev)
    next_t = F.first(obs_t, ignorenulls=True).over(w_next)

    frac = (F.col("bucket") - prev_t).cast("double") / (next_t - prev_t).cast(
        "double"
    )
    linear = F.when(
        prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
        prev_v + (next_v - prev_v) * frac,
    )
    return filled.select(
        *key_cols,
        "bucket",
        "raw",
        prev_v.alias("ffill"),
        F.round(F.coalesce(linear, prev_v, next_v), round_to).alias("interp"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence,
    state_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered state
    sequences: for each (from_state, to_state) adjacent pair within a
    key's timeline, the count and the row-conditional probability
    P(to | from) — the behavioral-analytics building block behind
    "what do users do after X" and the sanity check behind synthetic
    event generators.

    ``order_cols`` must totally order events WITHIN a key (pass a
    unique tie-break, e.g. ``[F.col("ts"), F.col("event_id")]``) or the
    lag pairing is nondeterministic.

    Scale shape: ONE shuffle on the key (the lag window), then a
    partial-agg'd groupBy over (from, to) — states are few, so the
    second shuffle carries ~|states|² rows per task. The probability
    denominator comes from a window SUM over the tiny transition
    frame, not a second corpus scan."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(key_col),
            *[c for c in order_cols],
            F.col(state_col).alias("to_state"),
        )
        .withColumn("from_state", F.lag("to_state").over(w))
        .filter(F.col("from_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    denom = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(denom), round_to
        ).alias("prob"),
    )
