"""Vector math over ``array<float>`` columns as pure Column algebra
(SURVEY.md §2.K): higher-order functions (zip_with/aggregate) keep the
whole computation inside Catalyst/codegen — no UDF, no Arrow boundary,
and predicate pushdown/pruning still work around it.

All math is done in DOUBLE: the fixtures store float32, and upcasting
once at the start makes the fold deterministic and oracle-comparable
(DuckDB computes the same left-to-right double fold).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right fold of elementwise products — matches DuckDB's
    list_sum(list_transform(list_zip(...))) order, so results are
    bit-identical across engines."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffsq = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffsq, F.lit(0.0), lambda acc, x: acc + x))


def normalize(a: Column | str) -> Column:
    """Unit-normalize; pre-normalizing once turns cosine top-k into dot
    top-k (halves the per-pair work in brute-force kNN)."""
    n = l2_norm(a)
    return F.transform(as_double(a), lambda x: x / n)
