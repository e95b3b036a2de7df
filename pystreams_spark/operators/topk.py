"""Top-k operators (SURVEY.md §2.F).

Global top-k: ``df.orderBy(...).limit(k)`` — Catalyst plans
TakeOrderedAndProject: each partition keeps a k-heap, the driver merges
N_partitions × k rows. No full sort, no full shuffle — this is the only
top-k shape that survives 100 TB.

Per-group top-k: row_number over (partition by group order by rank cols)
then filter ≤ k. One shuffle on the group key; each group sorts locally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Largest-k rows by ``order`` (pass desc() columns for 'largest').

    Include a unique tie-break column in ``order`` for deterministic
    results."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "_rn",
) -> DataFrame:
    """k best rows per group; the rank column is dropped from the output."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )
