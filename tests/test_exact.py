"""functions/exact: the engine-exact rounded-average contract.

Covers the r11 ADVICE overflow finding: the Spark-side accumulator must
survive sums whose doubled integer-scaled total exceeds int64 (reached
around sf≈50 for whole-table money averages), where a BIGINT sum wraps
silently in non-ANSI mode while DuckDB's HUGEINT raises-or-is-exact.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pystreams_spark.functions.exact import (
    avg_round_half_up,
    avg_round_half_up_sql,
)


def _duck_avg(vals, digits):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    return con.sql(
        f"SELECT {avg_round_half_up_sql('x', digits)} AS a FROM t"
    ).fetchone()[0]


def _spark_avg(spark, vals, digits):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    return df.agg(avg_round_half_up("x", digits).alias("a")).first()[0]


def test_half_case_rounds_up_identically(spark):
    # 12.5 micros-average lands exactly on a half at digit 6
    vals = [0.000012, 0.000013]
    assert _spark_avg(spark, vals, 6) == _duck_avg(vals, 6) == 0.000013


def test_sum_beyond_int64_matches_oracle(spark):
    # each value is 6e12 → 6e18 micros; 2·Σ = 2.4e19 > int64 max
    # (9.22e18). A BIGINT accumulator wraps silently on the Spark side;
    # DECIMAL(38,0) must agree with DuckDB's HUGEINT to the last digit.
    vals = [6.0e12 + 0.25, 6.0e12 + 0.25]
    got_s = _spark_avg(spark, vals, 6)
    got_d = _duck_avg(vals, 6)
    assert got_s == got_d == 6.0e12 + 0.25


def test_negative_values_truncate_toward_zero_identically(spark):
    # negative sums: Spark div and DuckDB // both truncate toward zero
    # (half-toward-zero for negatives) — the contract is cross-engine
    # identity, pinned here
    vals = [-0.000012, -0.000013]
    assert _spark_avg(spark, vals, 6) == _duck_avg(vals, 6) == -0.000012


def test_empty_group_is_null(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert df.agg(avg_round_half_up("x", 6).alias("a")).first()[0] is None


@pytest.mark.parametrize("digits", [2, 4, 6])
def test_scales_agree_cross_engine(spark, digits):
    vals = [123.4567, 0.015, 7.125, 99.995]
    assert _spark_avg(spark, vals, digits) == _duck_avg(vals, digits)


def test_resample_fill_contract_is_explicit(spark):
    """ADVICE r11: the micros contract must be opt-in, not keyed on the
    magic (agg='avg', round_to=6) combination. Values with more than 6
    significant decimals distinguish the two semantics."""
    from pystreams_spark.operators.timeseries import resample_fill

    rows = [
        ("u", "2024-01-01 00:00:01", 3e-7),
        ("u", "2024-01-01 00:00:02", 3e-7),
        ("u", "2024-01-01 00:00:03", 9e-7),
    ]
    df = spark.createDataFrame(rows, "u string, ts string, v double").select(
        "u", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    plain = resample_fill(df, "ts", "v", ["u"], 3600).first()
    assert plain.raw == 1e-6  # round(avg(raw), 6) — the default
    micros = resample_fill(
        df, "ts", "v", ["u"], 3600, avg_contract="micros_half_up"
    ).first()
    assert micros.raw == 0.0  # per-value quantization before the sum

    with pytest.raises(ValueError, match="avg_contract"):
        resample_fill(df, "ts", "v", ["u"], 3600, avg_contract="bogus")
    with pytest.raises(ValueError, match="only applies"):
        resample_fill(
            df, "ts", "v", ["u"], 3600, agg="max", avg_contract="micros_half_up"
        )
