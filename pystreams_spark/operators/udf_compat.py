"""UDF compatibility layer (SURVEY.md §2.J): the reference's programming
model is "bring a Python lambda". These adapters are the explicit slow
path — Arrow-batched pandas execution, never per-row pickled UDFs.

Each adapter documents its shuffle cost so callers can reason about the
100 TB plan: ``map_batches`` is narrow (no shuffle); ``grouped_apply``
and ``cogroup_apply`` shuffle once on the group key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def map_batches(df: DataFrame, fn: Callable, schema) -> DataFrame:
    """mapInPandas: fn(iterator[pd.DataFrame]) -> iterator[pd.DataFrame].
    Narrow — runs inside the current partitioning."""
    return df.mapInPandas(fn, schema)


def map_arrow_batches(df: DataFrame, fn: Callable, schema) -> DataFrame:
    """mapInArrow: fn(iterator[pyarrow.RecordBatch]) ->
    iterator[pyarrow.RecordBatch]. Narrow, like ``map_batches``, but
    skips the Arrow→pandas conversion entirely — the right adapter when
    the kernel is already columnar (numpy/pyarrow compute) and the
    pandas object step would only add copies."""
    return df.mapInArrow(fn, schema)


def map_rows(df: DataFrame, fn: Callable, schema) -> DataFrame:
    """Per-row dict→dict lambda adapted onto Arrow batches."""
    import pandas as pd

    def runner(batches):
        for pdf in batches:
            yield pd.DataFrame([fn(r) for r in pdf.to_dict("records")])

    return df.mapInPandas(runner, schema)


def grouped_apply(
    df: DataFrame, keys: list[str], fn: Callable, schema
) -> DataFrame:
    """applyInPandas: fn(pd.DataFrame) -> pd.DataFrame per key group.
    One shuffle on ``keys``; each group must fit in one worker's memory —
    pre-aggregate or salt giant keys first."""
    return df.groupBy(*keys).applyInPandas(fn, schema)


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    fn: Callable,
    schema,
) -> DataFrame:
    """Cogroup two DataFrames by key and apply fn(left_pdf, right_pdf) →
    pdf. One shuffle per side on its keys."""
    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(fn, schema)
    )


def scalar_pandas_udf(fn: Callable, return_type: str):
    """Vectorized scalar UDF: fn(pd.Series, ...) -> pd.Series."""
    return F.pandas_udf(fn, return_type)


def grouped_agg_udf(fn: Callable, return_type: str):
    """Grouped-aggregate UDF: fn(pd.Series, ...) -> scalar, usable inside
    groupBy().agg(). The GROUPED_AGG eval type is normally inferred from
    type hints; for hint-less lambdas we declare it explicitly."""
    from pyspark.sql.functions import PandasUDFType

    return F.pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)
