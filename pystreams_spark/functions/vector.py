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
    """NULL (not an ANSI DIVIDE_BY_ZERO error) when either vector has
    zero norm — aggregates then skip the undefined pair. try_divide is
    identical to / for every nonzero-norm pair, so oracle-checked
    callers are unaffected."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffsq = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffsq, F.lit(0.0), lambda acc, x: acc + x))


def normalize(a: Column | str) -> Column:
    """Unit-normalize; pre-normalizing once turns cosine top-k into dot
    top-k (halves the per-pair work in brute-force kNN). An all-zero
    vector is returned unchanged (norm clamped to 1) — dividing by the
    raw norm would raise DIVIDE_BY_ZERO under Spark 4's ANSI default,
    and zero vectors are in-domain for the quantizer in this module."""
    n = l2_norm(a)
    safe = F.when(n > 0.0, n).otherwise(F.lit(1.0))
    return F.transform(as_double(a), lambda x: x / safe)


def quantize_int8(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: struct(scale double,
    q array<tinyint>) with q_i = round(x_i / scale * 127). At 100 TB
    embedding storage this is the standard 4x shrink (float32 → int8 +
    one double per vector); reconstruction error is bounded by
    scale/127 per element (half-step after rounding — asserted in
    tests). All-zero vectors get scale 0 and all-zero codes. Pure
    Column algebra — quantization happens inside codegen, so it can
    run in the write path of a 1000-executor ingest with no Python."""
    v = as_double(a)
    scale = F.array_max(F.transform(v, F.abs))
    safe = F.when(scale > 0.0, scale).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.round(x / safe * 127.0).cast("tinyint"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qs: Column | str) -> Column:
    """Inverse of ``quantize_int8``: array<double> approximation
    x̂_i = q_i * scale / 127."""
    qs = F.col(qs) if isinstance(qs, str) else qs
    scale = qs["scale"]
    return F.transform(
        qs["q"], lambda c: c.cast("double") * scale / F.lit(127.0)
    )
