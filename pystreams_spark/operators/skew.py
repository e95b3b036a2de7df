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


def heavy_hitters(
    df: DataFrame, cols: Sequence[str], support: float = 0.05
) -> DataFrame:
    """Single-pass heavy-hitter sketch (Spark's ``stat.freqItems``,
    Misra-Gries style): per column, every value with frequency >
    ``support`` is guaranteed in the result (false positives possible,
    false negatives not). This is the skew DETECTOR: run it on join/agg
    keys to find the hot values worth salting (``salted_join`` /
    ``salted_aggregate``) before a 100 TB shuffle, for one narrow pass —
    no shuffle at all until the 1-row result.

    Returns one row per input column: (column, hot_values sorted array).
    Sketch output order is partition-dependent → arrays sorted for a
    stable rows-only check.
    """
    freq = df.stat.freqItems(list(cols), support)
    # freq: 1 row, one `<col>_freqItems` array per column → long shape
    rows = [
        freq.select(
            F.lit(c).alias("column"),
            F.array_sort(F.col(f"{c}_freqItems").cast("array<string>")).alias(
                "hot_values"
            ),
        )
        for c in cols
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


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
    rows) — which is why ``how`` is restricted to inner/left/left_semi/
    left_anti: a right or full outer join would emit one null-extended
    row PER REPLICA of an unmatched small-side key (salt_buckets
    copies), not one. Prefer AQE's runtime skew splitting when sizes
    are known; salting is the static tool for *predictably* hot keys
    (e.g. a null or default-valued FK). Replication multiplies the
    small side — keep it broadcast-sized per bucket.
    """
    exact = {"inner", "left", "left_outer", "leftouter", "left_semi",
             "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in exact:
        raise ValueError(
            f"salted_join(how={how!r}): only {sorted(exact)} preserve the "
            "unsalted join's semantics — an outer join on the replicated "
            "small side would duplicate its unmatched rows once per salt "
            "bucket. Use AQE skew-join handling for outer joins."
        )
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
