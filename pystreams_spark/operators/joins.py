"""Join operators Spark lacks natively (SURVEY.md §2.C): as-of join and
interval/range join helpers.

As-of join strategy — the union + last-value window trick:
instead of a per-left-row subquery (quadratic) or a BroadcastNestedLoop
range join (no pushdown), interleave both sides into ONE dataset sorted
by (key, time, side) and carry the most recent right payload forward
with ``last(..., ignorenulls=True)``. Cost: one shuffle on the key + one
per-key sort — the same price as a regular sort-merge join, independent
of time-domain size. This is the only as-of shape that holds at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    right_tiebreak: Sequence[str] = (),
    suffix: str = "_matched",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, attach the nearest right row within
    the same ``on`` key group (LEFT semantics: unmatched rows keep NULLs).

    ``direction='backward'`` (default): greatest right_time <= left_time
    — matches DuckDB ``ASOF LEFT JOIN`` with ``l.t >= r.t``.
    ``direction='forward'``: smallest right_time >= left_time.
    ``tolerance``: a Column/interval expression (e.g.
    ``F.expr("INTERVAL 1 DAY")``) or numeric bound; matches farther than
    the tolerance are nulled out (pandas merge_asof semantics).

    ``right_tiebreak`` orders equal-time right rows so the match is
    deterministic (last one wins).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = list(right_cols or [c for c in right.columns if c not in on])

    payload = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_time).alias("_mt_")
    )
    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(right_tiebreak)],
        payload.alias("_rp"),
    )
    l = left.select(
        "*",
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).alias(f"_tb_{i}") for i in range(len(right_tiebreak))],
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
    )
    r = r.select(
        *on,
        "_t",
        "_side",
        *[f"_tb_{i}" for i in range(len(right_tiebreak))],
        "_rp",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    ).select(*l.columns)

    # right rows sort BEFORE left rows at equal time (_side 0 < 1) →
    # inclusive match on ties; equal-time right rows ordered by the
    # tiebreak. Forward direction = the same scan over reversed time.
    time_order = F.asc("_t") if direction == "backward" else F.desc("_t")
    order = (
        [time_order, F.asc("_side")]
        + [F.asc_nulls_first(f"_tb_{i}") for i in range(len(right_tiebreak))]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    out_cols = [c for c in left.columns]
    match = F.col("_match")
    if tolerance is not None:
        delta = (
            (F.col(left_time) - match["_mt_"])
            if direction == "backward"
            else (match["_mt_"] - F.col(left_time))
        )
        match = F.when(delta <= tolerance, F.col("_match"))
    return (
        matched.filter(F.col("_side") == 1)
        .select(
            *out_cols,
            *[match[c].alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Point-in-interval join with coarse time-bucket pre-blocking.

    A naive `l.t BETWEEN r.start AND r.end` join is a nested loop; here
    both sides are bucketed onto coarse epoch-second buckets and
    equi-joined on (keys…, bucket) first, so the range predicate only
    filters within a bucket. Intervals spanning many buckets replicate
    the right row per bucket — choose ``bucket_seconds`` ≳ typical
    interval length. (Plain epoch arithmetic, not F.window: Spark
    forbids two window expressions in one plan.)
    """
    on = list(on)

    def bucket_of(c):
        return (F.unix_timestamp(F.col(c)) / bucket_seconds).cast("long")

    lb = left.withColumn("_bucket", bucket_of(left_time))
    rb = right.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket_of(right_start), bucket_of(right_end))),
    )
    cond = (F.col(left_time) >= F.col(right_start)) & (
        F.col(left_time) <= F.col(right_end)
    )
    return lb.join(rb, on + ["_bucket"]).filter(cond).drop("_bucket")


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE INTO semantics as a pure DataFrame op (no table format
    needed): update rows overwrite matching base rows by key, unmatched
    update rows are inserted, unmatched base rows pass through —
    a FULL OUTER JOIN picking the update side's value whenever the key
    matched. Matching is tracked with an explicit presence flag (NOT
    per-column COALESCE): an update row that sets a column to NULL
    really does null it out, matching Delta/Iceberg
    ``WHEN MATCHED THEN UPDATE SET *`` semantics.

    ``updates`` must share the base schema. This is the shuffle-on-key
    plan Delta/Iceberg MERGE executes underneath (minus their
    transaction log); at 100 TB both sides hash-partition on the key,
    and a broadcast hint on a small ``updates`` side removes the big
    shuffle entirely.
    """
    b = base.alias("b")
    u = updates.withColumn("_upd", F.lit(True)).alias("u")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}") == F.col(f"u.{k}")
        cond = c if cond is None else (cond & c)
    matched = F.col("u._upd").isNotNull()  # true on matched + insert rows
    return b.join(u, cond, "full_outer").select(
        *[
            F.when(matched, F.col(f"u.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in base.columns
        ]
    )
