"""Privacy-risk profiling for training-data releases (SURVEY.md §2.K —
the audit that runs BEFORE a corpus ships: how re-identifiable are rows
from their quasi-identifiers, and how exposed are sensitive values
within each quasi-identifier group).

k-anonymity (Sweeney 2002): a row is k-anonymous when at least k rows
share its quasi-identifier combination — groups smaller than k are
re-identification risks. l-diversity (Machanavelli et al. 2007) adds
that each group must carry ≥ l DISTINCT sensitive values, catching the
homogeneity attack k-anonymity misses (a size-50 group whose every row
has the same diagnosis still leaks it).

Scale shape: ONE groupBy over the quasi-identifier columns (the only
corpus-sized job — partial-agg'd, shuffle carries distinct QI combos),
then every k/l threshold is a conditional sum over that KB-to-MB-sized
equivalence-class frame. Adding thresholds is free; adding QI columns
only widens the shuffle key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equivalence_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """One row per quasi-identifier combination: ``class_size`` (= the
    k every member row has) and, when ``sensitive_col`` is given,
    ``n_sensitive`` distinct sensitive values (= the group's l)."""
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k_values: Sequence[int] = (2, 5, 10),
    sensitive_col: str | None = None,
    l_value: int = 2,
) -> DataFrame:
    """Per-k risk report: for each k in ``k_values``, how many
    equivalence classes (and how many ROWS — the number that matters
    for release decisions) fall below k-anonymity; with a
    ``sensitive_col``, also how many of those below-k rows additionally
    fail l-diversity at ``l_value`` (the doubly-exposed subset).

    Output: (k, n_classes, n_classes_below, n_rows_below,
    rows_below_frac[, n_rows_below_l]) — one row per requested k, plus
    min/observed class stats carried on every row so the report is
    self-contained."""
    ks = sorted(set(int(k) for k in k_values))
    if not ks or ks[0] < 2:
        raise ValueError(
            f"k_anonymity_profile: k_values must all be >= 2, got {k_values}"
        )
    ec = equivalence_classes(df, quasi_cols, sensitive_col)
    # one corpus scan total: replicate each (tiny) equivalence-class row
    # per requested k and aggregate once, instead of re-running the
    # corpus groupBy per threshold
    fanned = ec.withColumn(
        "k", F.explode(F.array(*[F.lit(k) for k in ks]).cast("array<int>"))
    )
    below = F.col("class_size") < F.col("k")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(below.cast("long")).alias("n_classes_below"),
        F.sum(F.when(below, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_rows_below"),
        F.round(
            F.sum(F.when(below, F.col("class_size")).otherwise(0))
            .cast("double")
            / F.sum("class_size"),
            6,
        ).alias("rows_below_frac"),
        F.min("class_size").cast("long").alias("min_class_size"),
    ]
    if sensitive_col is not None:
        exposed = below & (F.col("n_sensitive") < int(l_value))
        aggs.append(
            F.sum(F.when(exposed, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("n_rows_below_l")
        )
    return fanned.groupBy("k").agg(*aggs).orderBy("k")
