"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping (SURVEY.md §4.4 scale posture).

Parquet readers prune row groups via min/max statistics. A sort on one
column gives perfect pruning on that column and none on others;
interleaving the bits of several range-normalized columns (the Z-order
curve) makes rows that are close in EVERY dimension land in the same
row groups, so selective filters on any of the clustered columns skip
most of the file. This is the same technique behind `OPTIMIZE ZORDER
BY` in lakehouse table formats, expressed with public Spark primitives:
one min/max aggregate, a pure-Column bit interleave, then
repartitionByRange + sortWithinPartitions on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: Sequence[str],
    ranges: dict[str, tuple[Column, Column]],
    bits: int = 10,
) -> Column:
    """Morton key: each column is range-normalized to ``bits`` bits
    using the (lo, hi) Columns in ``ranges``, then bit-interleaved.
    Pure Column algebra — stays in codegen, no UDF."""
    if bits * len(cols) > 63:
        # Spark's shiftleft wraps the shift amount mod 64, so exceeding
        # 63 interleaved bits would silently fold high-order bits onto
        # low positions — corrupt Morton keys and bad clustering, with
        # no error. Refuse instead; callers can lower `bits`.
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits}*{len(cols)} = "
            f"{bits * len(cols)} exceeds the 63 usable bits of a long key; "
            f"use bits <= {63 // len(cols)} for {len(cols)} columns"
        )
    quantized = []
    for c in cols:
        lo, hi = ranges[c]
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        q = F.least(
            F.floor((F.col(c).cast("double") - lo) / span * (1 << bits)),
            F.lit((1 << bits) - 1),
        ).cast("long")
        quantized.append(F.greatest(q, F.lit(0)))
    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, q in enumerate(quantized):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_by(
    df: DataFrame, cols: Sequence[str], bits: int = 10, key_name: str = "_zorder"
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve over ``cols``: one partial-
    aggregated min/max pass (broadcast, 1 row), then range-repartition +
    in-partition sort on the Morton key. Write the result with
    ``write.parquet`` and every row group's min/max stats are tight in
    ALL clustered dimensions. The key column is dropped after layout —
    it only exists to drive the sort."""
    cols = list(cols)
    rng = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    ranges = {c: (F.col(f"_lo_{c}"), F.col(f"_hi_{c}")) for c in cols}
    keyed = df.crossJoin(F.broadcast(rng)).withColumn(
        key_name, zorder_key(cols, ranges, bits)
    ).drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
    return (
        keyed.repartitionByRange(key_name)
        .sortWithinPartitions(key_name)
        .drop(key_name)
    )
