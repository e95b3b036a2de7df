"""Differential test mirroring the driver's correctness gate: every
(queries, oracle_sql) pair must agree with DuckDB on row count, column
names, and exact values (order-insensitive).

Stricter than the driver's hash check: we require exact value equality
(bitwise for floats), so any stringification the driver hashes will also
match.
"""

import math

import numpy as np
import pytest

from pystreams_spark.queries import ORACLE, QUERIES


def _norm_val(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, (np.floating,)):
        return _norm_val(float(v))
    if isinstance(v, (np.integer,)):
        return ("i", int(v))
    if isinstance(v, (int, bool)):
        return ("i", int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a",) + tuple(_norm_val(x) for x in v)
    return ("s", str(v))


def _norm_rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_val(v) for v in row) for row in pdf.itertuples(index=False)]
    return cols, sorted(rows)


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sp_df = QUERIES[name](spark, sf_dir)
    sp = sp_df.toPandas()
    dk = duck.execute(ORACLE[name]).df()

    assert len(sp) == len(dk), f"{name}: row count {len(sp)} vs oracle {len(dk)}"
    assert sorted(sp.columns) == sorted(dk.columns), (
        f"{name}: columns {sorted(sp.columns)} vs oracle {sorted(dk.columns)}"
    )
    sp_cols, sp_rows = _norm_rows(sp)
    dk_cols, dk_rows = _norm_rows(dk)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sp_rows, dk_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatching rows: {mismatches[:3]}"


def test_all_oracle_keys_have_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still run and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
