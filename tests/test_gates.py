"""Invariant gates for rows-only queries (VERDICT r5 #7): a rows-only
driver verdict certifies only "ran, produced rows", so every such query
must carry an EXECUTED quality gate (assert_true in the plan), not just
an annotation column. The meta-test here keeps that audit mechanical —
a new rows-only query without a gate fails CI."""

import inspect

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from pystreams_spark.gates import binomial_bound, gate_global, gate_rows
from pystreams_spark.queries import ORACLE, QUERIES

# Evidence markers that a query's plan carries a hard gate: either the
# shared gate helpers, a recall floor (whose annotate helper embeds
# assert_true), or a literal assert_true.
_GATE_MARKERS = (
    "gate_rows",
    "gate_global",
    "assert_true",
    "min_avg_recall=",
)


def test_every_rows_only_query_is_invariant_gated():
    rows_only = [n for n in QUERIES if n not in ORACLE]
    ungated = []
    for n in rows_only:
        src = inspect.getsource(QUERIES[n])
        if not any(m in src for m in _GATE_MARKERS):
            ungated.append(n)
    assert ungated == [], (
        f"rows-only queries without an executed invariant gate: {ungated} — "
        "add gate_rows/gate_global (pystreams_spark.gates) or a recall floor"
    )


def test_gate_rows_passes_and_fires(spark):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    # clean: all rows pass through unchanged
    assert gate_rows(df, F.col("v") >= 0, "neg").count() == 10
    # violation: the job FAILS with the message, not a filtered result
    with pytest.raises(Exception, match="v must stay under 15"):
        gate_rows(df, F.col("v") < 15, "v must stay under 15").collect()


def test_gate_global_passes_and_fires(spark):
    from pyspark.sql import Window

    df = spark.range(10).withColumn("v", F.lit(1))
    total = F.sum("v").over(Window.partitionBy())
    assert gate_global(df, total == 10, "sum").count() == 10
    assert gate_global(df, total == 10, "sum").columns == ["id", "v"]  # _gate dropped
    with pytest.raises(Exception, match="expected 11"):
        gate_global(df, total == 11, "expected 11").collect()


def test_binomial_bound_shape(spark):
    row = spark.range(1).select(
        binomial_bound(F.lit(10000), 0.1).alias("b")
    ).collect()[0]
    # 6 * sqrt(10000 * 0.09) + 1 = 6*30 + 1
    assert abs(row.b - 181.0) < 1e-9


def test_planted_violations_fire_in_real_queries(spark, sf_dir, tmp_path):
    """The gates guard REAL failure modes: corrupt a real pipeline the
    way a regression would and watch the gate kill the job."""
    from pystreams_spark.io import load_table
    from pystreams_spark.operators.packing import pack_sequences

    # a pack run against a mis-tagged token count (the classic unit
    # mix-up: chars instead of tokens) violates n_tokens <= bin_fill
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.length("text"))  # wrong unit, way over 512
        .limit(50)
    )
    packed = pack_sequences(d, max_tokens=512)
    bad = gate_rows(
        packed,
        (F.col("bin_fill") <= 512),
        "bin over budget",
    )
    with pytest.raises(Exception, match="bin over budget"):
        bad.collect()