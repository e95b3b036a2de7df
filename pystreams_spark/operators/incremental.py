"""Mergeable aggregation state — the incremental-maintenance pattern
behind every production metrics pipeline at 100 TB: summarize each
arriving batch into a tiny per-group state, MERGE states instead of
ever rescanning history (SURVEY.md §2.K scale posture; the batch
analog of what HLL rollups do for distinct counts).

The state tuple (n, sum, sum_sq, min, max) is a commutative monoid:
merging batch states in any order and any grouping equals the state of
the concatenated data — exactly (counts and integer sums are exact;
the float moments are sums, so merge-order only permutes additions the
same way partial aggregation already does). ``finalize_stats`` derives
mean/stddev at read time; history never gets rescanned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stats_state", "merge_stats", "finalize_stats"]


def stats_state(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """One partial-agg scan of a batch → per-group mergeable state
    (n, sum, sum_sq, min, max). KB-sized per batch at any corpus size;
    store it, never the batch.

    NULL values are ignored CONSISTENTLY: ``n`` counts non-NULL values
    (not rows), matching the NULL-skipping sum/min/max — otherwise a
    nullable column silently skews every derived mean/stddev. The
    squares accumulate in DOUBLE: squaring in the input's integer type
    overflows per-row (an int value > 46340 ANSI-crashes; a long
    sum of squares wraps at corpus scale), while integer-valued doubles
    add exactly below 2^53 and degrade gracefully, not wrongly, above."""
    v = F.col(value_col)
    vd = v.cast("double")
    return df.groupBy(*group_cols).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(v).alias("sum"),
        F.sum(vd * vd).alias("sum_sq"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_stats(
    *states: DataFrame, group_cols: Sequence[str] | None = None
) -> DataFrame:
    """Merge any number of state frames into one — a union of tiny
    frames plus one grouped fold. Associative and commutative, so
    nightly/hourly/backfill states compose in any order.

    Pass ``group_cols`` explicitly (same value given to
    ``stats_state``) when any group column is itself named like a
    state field ('n', 'sum', 'sum_sq', 'min', 'max') — the default
    infers the group keys by excluding those reserved names, which
    would silently aggregate a colliding group column away."""
    if not states:
        raise ValueError("merge_stats needs at least one state frame")
    if group_cols is None:
        group_cols = [c for c in states[0].columns
                      if c not in ("n", "sum", "sum_sq", "min", "max")]
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum").alias("sum"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def finalize_stats(state: DataFrame, round_to: int = 6) -> DataFrame:
    """Derive (mean, stddev_pop) from the state at read time. The
    stddev comes from the documented state formula
    sqrt((sum_sq − sum²/n)/n) — stated explicitly so an oracle can
    reproduce it bit-for-bit from the same exact sums."""
    n = F.col("n").cast("double")
    s = F.col("sum").cast("double")
    sq = F.col("sum_sq").cast("double")
    var = (sq - s * s / n) / n
    return state.select(
        *[c for c in state.columns if c not in ("n", "sum", "sum_sq", "min", "max")],
        F.col("n"),
        # float sums carry merge-order ulp noise (addition is not
        # associative — the same order-dependence partial aggregation
        # has); round the PUBLISHED sum so any merge order reports the
        # identical artifact. Integer sums pass through unchanged.
        F.round(F.col("sum"), round_to).alias("sum"),
        F.col("min"),
        F.col("max"),
        F.round(s / n, round_to).alias("mean"),
        # clamp tiny negative float residue before the sqrt; the n > 0
        # gate keeps an all-NULL group's stddev NULL like its mean —
        # greatest(NULL, 0.0) would otherwise claim zero dispersion
        # for a group with no observed values
        F.when(
            F.col("n") > 0,
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))), round_to),
        ).alias("stddev"),
    )
