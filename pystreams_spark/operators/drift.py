"""Distribution-drift detection between a reference corpus and a new
batch: Population Stability Index (the standard "did the new data
shift" score in production ML monitoring) plus a binned
Kolmogorov–Smirnov statistic, per column.

Everything is deterministic Column algebra — no sampling, no RNG:

- bins are ``n_bins`` fixed-width intervals over the REFERENCE min/max
  (computed in-plan as a 1-row broadcast, not a driver collect);
  values outside the reference range clamp into the edge bins, which
  is exactly what makes range drift visible;
- PSI uses Laplace-smoothed proportions (count + 0.5 per bin), the
  textbook zero-bin guard, so the score is defined even when a bin
  empties out on one side;
- KS is the max |ΔCDF| over bin boundaries of the raw proportions.

Cost: ``drift_report`` scans the reference twice (one all-column
min/max agg + one all-column×all-bin conditional-count agg) and the
current side once, REGARDLESS of how many columns are requested — the
per-column work is folded into a single wide aggregate per side, the
same shape ``streaming.DriftMonitor`` uses per micro-batch. Everything
after the aggs runs on an ``n_cols × n_bins``-row frame. Rule of thumb
(industry convention): PSI < 0.1 stable, 0.1–0.25 moderate shift,
> 0.25 action needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["psi_bins", "drift_report"]


def _binned_counts(
    df: DataFrame, col: str, lo, hi, n_bins: int
) -> DataFrame:
    """(bin, n) for ``col`` over fixed-width bins of [lo, hi]; values
    clamp into the edge bins; constant reference range → single bin 0."""
    width = (F.col(hi) - F.col(lo)) / n_bins
    raw = F.when(
        width > 0.0,
        F.floor((F.col(col) - F.col(lo)) / width),
    ).otherwise(F.lit(0))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin diagnostic frame: (bin, n_ref, n_cur, p_ref, p_cur,
    psi_term) — the drill-down behind a bad PSI score."""
    stats = F.broadcast(
        ref.agg(
            F.min(F.col(col).cast("double")).alias("_lo"),
            F.max(F.col(col).cast("double")).alias("_hi"),
        )
    )
    r = _binned_counts(ref.crossJoin(stats), col, "_lo", "_hi", n_bins)
    c = _binned_counts(cur.crossJoin(stats), col, "_lo", "_hi", n_bins)
    bins = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(r, "bin", "left")
        .withColumnRenamed("n", "n_ref")
        .join(c, "bin", "left")
        .withColumnRenamed("n", "n_cur")
        .fillna(0, ["n_ref", "n_cur"])
    )
    tot = F.broadcast(
        joined.agg(
            F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
        )
    )
    out = joined.crossJoin(tot)
    # Laplace smoothing: (n + 0.5) / (total + 0.5 * bins) — PSI defined
    # even when a bin is empty on one side
    p_ref = (F.col("n_ref") + 0.5) / (F.col("_tr") + 0.5 * n_bins)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("_tc") + 0.5 * n_bins)
    return out.select(
        "bin",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_term"),
    )


def _side_bin_counts(
    df: DataFrame, columns: Sequence[str], n_bins: int
) -> DataFrame:
    """(column, bin, n) for ALL columns in ONE scan: each (col, bin)
    cell is a conditional count folded into a single wide aggregate
    (n_cols × n_bins expressions, partial-agg'd map-side), then the
    1-row result is reshaped with ``inline``. Expects the per-column
    reference bounds to be present as ``_lo_{i}`` / ``_hi_{i}``."""
    aggs = []
    for i, col in enumerate(columns):
        width = (F.col(f"_hi_{i}") - F.col(f"_lo_{i}")) / n_bins
        raw = F.when(
            width > 0.0,
            F.floor((F.col(col).cast("double") - F.col(f"_lo_{i}")) / width),
        ).otherwise(F.lit(0))
        # the isNotNull gate is load-bearing: greatest()/otherwise(0)
        # both swallow NULL inputs into bin 0, which would count NULL
        # values as data (and diverge from the oracle's IS NOT NULL)
        b = F.when(
            F.col(col).isNotNull(),
            F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)),
        ).cast("int")
        for j in range(n_bins):
            aggs.append(
                F.count(F.when(b == j, F.lit(1))).alias(f"_n_{i}_{j}")
            )
    one = df.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(col).alias("column"),
                F.lit(j).cast("int").alias("bin"),
                F.col(f"_n_{i}_{j}").alias("n"),
            )
            for i, col in enumerate(columns)
            for j in range(n_bins)
        ]
    )
    return one.select(F.inline(cells))


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    columns: Sequence[str],
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """One row per column: (column, n_ref, n_cur, psi, ks). PSI from
    the smoothed proportions, KS as max |ΔCDF| of the raw proportions.

    Scan-sharing: one reference agg computes every column's min/max,
    then one wide conditional-count agg per side bins every column —
    3 input scans total however many columns are requested. The CDF
    windows run over the ``n_cols × n_bins``-row frame, partitioned by
    column — NOT the corpus-sized Window cliff the plan linter guards
    against; all corpus-sized work happened in the partial-agg'd
    counts. An empty current side yields NULL ks (``try_divide``)
    instead of an ANSI DIVIDE_BY_ZERO."""
    from pyspark.sql import Window

    if not columns:
        raise ValueError("drift_report: columns must be non-empty")

    stats = F.broadcast(
        ref.agg(
            *[
                e
                for i, c in enumerate(columns)
                for e in (
                    F.min(F.col(c).cast("double")).alias(f"_lo_{i}"),
                    F.max(F.col(c).cast("double")).alias(f"_hi_{i}"),
                )
            ]
        )
    )
    r = _side_bin_counts(ref.crossJoin(stats), columns, n_bins).withColumnRenamed("n", "n_ref")
    c = _side_bin_counts(cur.crossJoin(stats), columns, n_bins).withColumnRenamed("n", "n_cur")
    joined = r.join(c, ["column", "bin"])  # both sides emit every (column, bin)

    w_all = Window.partitionBy("column")
    w_cum = (
        Window.partitionBy("column")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tr = F.sum("n_ref").over(w_all)
    tc = F.sum("n_cur").over(w_all)
    p_ref = (F.col("n_ref") + 0.5) / (tr + 0.5 * n_bins)
    p_cur = (F.col("n_cur") + 0.5) / (tc + 0.5 * n_bins)
    cdf_diff = F.abs(
        F.try_divide(F.sum("n_ref").over(w_cum), tr.cast("double"))
        - F.try_divide(F.sum("n_cur").over(w_cum), tc.cast("double"))
    )
    return (
        joined.select(
            "column",
            "n_ref",
            "n_cur",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("_psi_term"),
            cdf_diff.alias("_cdf_diff"),
        )
        .groupBy("column")
        .agg(
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
            F.round(F.sum("_psi_term"), round_to).alias("psi"),
            F.round(F.max("_cdf_diff"), round_to).alias("ks"),
        )
    )
