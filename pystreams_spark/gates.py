"""Execution-time invariant gates for approximate / engine-seeded
queries (SURVEY §5.2 rows-only tier): a rows-only correctness verdict
only certifies "ran, produced rows" — these gates move the quality
contract INTO the plan, so a violated invariant fails the job loudly
instead of drifting silently under a weaker check. Pattern shared with
`operators/similarity.annotate_recall_vs_exact`'s recall floor:
``filter(coalesce(assert_true(cond, msg), lit(True)))`` evaluates the
condition on EVERY row (the filter is not prunable — assert_true
returns NULL on success, so coalesce passes all rows) and raises
SparkRuntimeException with ``msg`` on the first violating row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gate_rows(df: DataFrame, cond: Column, msg: str) -> DataFrame:
    """Per-row hard gate: raise ``msg`` (with a row tag appended when
    it is a Column) if ``cond`` is false on any row; otherwise pass the
    frame through unchanged."""
    chk = F.assert_true(cond, F.lit(msg))
    return df.filter(F.coalesce(chk, F.lit(True)))


def gate_global(df: DataFrame, agg_cond: Column, msg: str) -> DataFrame:
    """Whole-result hard gate: ``agg_cond`` is an expression over
    aggregate window functions (e.g.
    ``F.sum(x).over(Window.partitionBy()) == 50``) — meant for result
    sets that are already small (reports, candidate lists), where one
    extra single-partition window over k rows is free."""
    marked = df.withColumn("_gate", agg_cond)
    chk = F.assert_true(F.col("_gate"), F.lit(msg))
    return marked.filter(F.coalesce(chk, F.lit(True))).drop("_gate")


def binomial_bound(n_trials: Column, p: float, sigmas: float = 6.0) -> Column:
    """± bound for a Binomial(n, p) count at ``sigmas`` standard
    deviations — the tolerance a seeded-sampling gate should allow
    (6σ ⇒ false-alarm probability ~1e-9 per group)."""
    import math

    return F.lit(sigmas) * F.sqrt(n_trials * F.lit(p * (1.0 - p))) + F.lit(1.0)
