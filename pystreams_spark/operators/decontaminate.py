"""Benchmark decontamination (SURVEY.md §2.K): flag training documents
that share word n-gram shingles with an evaluation/benchmark set.

The standard contamination check for LLM training corpora (the GPT-3
appendix / Dolma / FineWeb recipe, re-expressed Spark-first): any train
document sharing ≥ ``min_overlap`` distinct n-grams with any eval
document is flagged for removal or auditing.

Scale shape (100 TB corpus, MB-scale benchmark suite):
- The eval side is shingled separately — it is tiny by construction, so
  its distinct (gram, eval_id) table broadcasts everywhere.
- The train side streams through ONE narrow shingle kernel pass, then a
  broadcast hash join — no shuffle of train text or grams, no
  materialization of the train gram table. The only shuffle is the
  final per-doc aggregate, keyed by doc_id (high-cardinality, skew-free).
- Two kernel evaluations total, over DISJOINT inputs (eval rows, train
  rows) — deliberately NOT a shared-lineage branch, so nothing needs a
  checkpoint and nothing is computed twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def contaminated_docs(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
) -> DataFrame:
    """Train docs sharing ≥ ``min_overlap`` distinct word ``n``-gram
    shingles with the eval set.

    Returns (id_col, n_matched_grams, n_eval_docs_hit), one row per
    contaminated train doc. Shingle semantics match
    ``functions.text.shingles`` (distinct word n-grams; a doc with < n
    words contributes its single short shingle), so the result is
    oracle-checkable in ANSI SQL on the string grams.
    """
    from ..functions.text_kernels import shingle_strings_udf
    from ..io import ensure_parallelism

    kernel = shingle_strings_udf(n)
    ev = (
        eval_set.select(
            F.col(eval_id_col).alias("_eval_id"),
            F.explode(kernel(F.col(text_col))).alias("_gram"),
        )
        .filter(F.col("_gram") != "")
        .distinct()
    )
    tr = (
        ensure_parallelism(train)
        .select(F.col(id_col), F.explode(kernel(F.col(text_col))).alias("_gram"))
        .filter(F.col("_gram") != "")
    )
    return (
        tr.join(F.broadcast(ev), "_gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_gram").alias("n_matched_grams"),
            F.countDistinct("_eval_id").alias("n_eval_docs_hit"),
        )
        .filter(F.col("n_matched_grams") >= min_overlap)
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
) -> DataFrame:
    """Remove contaminated docs from ``train`` (left-anti against the
    flagged set). The flagged table is doc_id + two longs — broadcast by
    AQE at any realistic contamination rate."""
    flagged = contaminated_docs(
        train, eval_set, n, min_overlap, text_col, id_col, eval_id_col
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")


def shuffle_key(id_col: str, seed: int, hash_fn: str = "md5"):
    """Deterministic per-row shuffle sort key.

    ``md5`` (default): md5 hex of ``"<id>:<seed>"`` — engine-portable
    (DuckDB/Trino/Spark all produce the identical digest), so the
    resulting order is oracle-checkable. ``xxhash64``: Spark's native
    64-bit hash — ~2-3x cheaper per row, same statistical quality, but
    engine-specific; use it when portability of the exact order doesn't
    matter (it rarely does for a training shuffle — the md5 default is
    chosen for verifiability)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(F.col(id_col), F.lit(seed))
    return F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )


def seeded_global_shuffle(
    df: DataFrame, seed: int = 42, id_col: str = "doc_id", hash_fn: str = "md5"
) -> DataFrame:
    """Deterministic global random permutation — the final step of every
    training-data pipeline (examples must arrive in hash-random order,
    reproducibly, across any number of output shards).

    Sort key = hash(id, seed) (see ``shuffle_key``; md5 default → the
    order is reproducible in ANY engine, which is what makes the r4
    oracle check possible), tie-broken by id: fully distributed
    (range-partitioned sort, no driver involvement), stable across runs
    and cluster sizes, and re-seedable per epoch. At 100 TB this is one
    range-exchange — the same cost as any global sort — and writing the
    result partitioned preserves the order per shard."""
    return df.orderBy(
        shuffle_key(id_col, seed, hash_fn).asc(), F.col(id_col).asc()
    )
