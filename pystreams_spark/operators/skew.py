"""Skew-handling operators (SURVEY.md §4.4).

A groupBy on a skewed key sends the hot key's entire volume to one
reducer. ``salted_aggregate`` runs the classic two-phase plan:
key → (key, salt) partial aggregate → key final aggregate. The hot key
fans out over ``salt_buckets`` reducers in phase 1 and the phase-2 input
is only |keys| × salt_buckets rows.

Only algebraic aggregates (sum/count/min/max, and avg via sum+count)
can be salted this way. AQE's skew-join splitting covers the join side;
this covers aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: re-aggregation rule per phase-1 aggregate name
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (kind, column) with kind in
    sum/count/min/max, e.g. ``{"n": ("count", F.lit(1)),
    "total": ("sum", F.col("value"))}``.
    """
    keys = list(keys)
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))

    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if kind == "count" else getattr(F, kind)(col)).alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[_MERGE[kind](name).alias(name) for name, (kind, col) in aggs.items()]
    )
    return phase2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join by salting: the big (skewed) side gets a
    uniform salt; the small side is replicated once per salt value; the
    join runs on (key, salt), splitting each hot key over
    ``salt_buckets`` reducers.

    Join results are exactly the unsalted join's (salt only re-routes
    rows). Prefer AQE's runtime skew splitting when sizes are known;
    salting is the static tool for *predictably* hot keys (e.g. a null
    or default-valued FK). Replication multiplies the small side —
    keep it broadcast-sized per bucket.
    """
    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
        ).cast("int"),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return out.drop("_salt")
