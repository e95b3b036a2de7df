"""Corpus-selection operators for training-data pipelines: global
ordered cumulative sums (the primitive behind token-budget cutoffs and
coverage curves), budget-bounded corpus selection, and language-mixture
resampling weights.

The core problem is that "take documents in priority order until the
token budget is hit" needs a GLOBAL running total, and a naive
`Window.orderBy(...)` without partition keys plans as a single-task
sort — the classic scale cliff. `ordered_cumsum` keeps the same
semantics with a two-pass shape that stays parallel at any size:

1. range-partition + sort locally on the priority key (one shuffle, the
   same layout a distributed ORDER BY uses),
2. per-partition totals → driver (|partitions| rows, KBs at any scale)
   → running offsets,
3. per-partition window cumsum (parallel — partitioned by the physical
   partition id) plus the broadcast offset.

This is the standard distributed prefix-sum recipe (the same two-pass
offsets as RDD ``zipWithIndex``), expressed in Column algebra — no
Python kernel, everything stays in codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordered_cumsum(
    df: DataFrame,
    order: Sequence[Column],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running SUM(``value_col``) over the global
    order given by ``order`` (Column expressions, may carry ``.desc()``).

    Scale shape: ONE range shuffle + local sort (identical cost to a
    distributed ORDER BY on the same keys), a driver-side offsets pass
    of |partitions| rows, and a NARROW per-partition cumsum kernel
    (vectorized, order-preserving) that adds the broadcast offsets.
    A Window.partitionBy(pid) would be semantically identical but
    plans an extra full Exchange — Catalyst cannot prove the
    checkpointed frame is already pid-clustered, so it re-shuffles on
    hash(pid) (observed in the r4 plan audit); the kernel keeps the
    second pass pipelined. The sorted frame is localCheckpoint'ed so
    the offsets job and the downstream consumer share one
    materialization (and one range sampling) instead of recomputing
    the sort.
    """
    import numpy as np

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = {
        r["_pid"]: r["_s"]
        for r in ranged.groupBy("_pid").agg(F.sum(value_col).alias("_s")).collect()
    }
    acc = 0
    offsets: dict[int, float] = {}
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0

    integral = ranged.schema[value_col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint",
    )
    out_type = "bigint" if integral else "double"
    dtype = np.int64 if integral else np.float64
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` {out_type}"]
    )
    bc = spark.sparkContext.broadcast(offsets)

    def kernel(batches):
        run = dtype(0)
        off = None
        for pdf in batches:
            if not len(pdf):
                continue
            if off is None:
                off = dtype(bc.value.get(int(pdf["_pid"].iloc[0]), 0))
            vals = pdf[value_col].to_numpy(dtype=dtype)
            pdf = pdf.drop(columns=["_pid"])
            pdf[out_col] = vals.cumsum(dtype=dtype) + off + run
            run += vals.sum(dtype=dtype)
            yield pdf

    return ranged.mapInPandas(kernel, schema)


def select_token_budget(
    df: DataFrame,
    order: Sequence[Column],
    token_col: str,
    budget: int,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Keep rows in priority order while the running token total BEFORE
    the row is under ``budget`` (so the document that crosses the
    boundary is included — a budget is a target, not a hard ceiling,
    and dropping it would under-fill every epoch). The mixture-building
    step of a data pipeline: "best documents first until N tokens"."""
    cum = ordered_cumsum(df, order, token_col, out_col=cum_col)
    return cum.filter(F.col(cum_col) - F.col(token_col) < budget)


def mixture_weights(
    df: DataFrame,
    group_col: str,
    token_col: str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Per-group resampling weights that reshape the corpus token
    mixture to a target distribution (uniform across groups unless
    ``target_shares`` gives explicit fractions): weight(g) =
    target_share(g) / actual_share(g). A weight > 1 means the group is
    under-represented (upsample / repeat epochs); < 1 means downsample.

    One grouped aggregate + a 1-row broadcast of the global totals —
    nothing here grows with corpus size except the single token scan.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("group_tokens"),
    )
    tot = per.agg(
        F.sum("group_tokens").alias("_total_tokens"),
        F.count(F.lit(1)).alias("_n_groups"),
    )
    out = per.crossJoin(F.broadcast(tot))
    if target_shares is None:
        target = 1.0 / F.col("_n_groups")
    else:
        # an incomplete share dict would silently emit NULL weights for
        # the missing groups — a typo'd mixture must fail, not under-
        # specify the resampling plan (groups are few: cheap collect)
        observed = {r[0] for r in per.select(group_col).collect()}
        missing = sorted(g for g in observed if g not in target_shares)
        if missing:
            raise ValueError(
                f"mixture_weights: target_shares missing groups {missing} "
                f"present in the corpus; give every group a share "
                f"(0.0 to drop it explicitly)"
            )
        mapping = F.create_map(
            *[x for k, v in target_shares.items() for x in (F.lit(k), F.lit(v))]
        )
        target = mapping[F.col(group_col)]
    # try_divide: a zero-token group (or an empty corpus) yields NULL
    # shares/weights instead of an ANSI DIVIDE_BY_ZERO crash
    actual = F.try_divide(F.col("group_tokens"), F.col("_total_tokens"))
    return out.select(
        group_col,
        "n_docs",
        F.col("group_tokens").cast("long").alias("group_tokens"),
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(F.try_divide(target, actual), 6).alias("weight"),
    )


def unigram_surprisal_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: Sequence[str] = (),
    vocab_broadcast_max: int = 5_000_000,
) -> DataFrame:
    """Per-document mean unigram surprisal −ln p(w) under a
    corpus-self-fit unigram model (the cheap stand-in for the KenLM
    perplexity filters of CCNet/Gopher). Returns
    (id, carry_cols…, surprisal).

    Scale switch: the vocab (word, count) frame broadcasts onto the
    token stream only while it is verifiably small
    (``broadcast_if_small`` under ``vocab_broadcast_max``); above the
    cap — a web-scale corpus's unigram vocabulary easily exceeds any
    broadcast budget — the SAME plan falls back to a hash-partitioned
    shuffle join on the word key. Pass ``vocab_broadcast_max=0`` to
    force the shuffle form. No UDF anywhere — ln/avg are codegen'd.
    """
    from ..functions.text import tokens
    from ..io import broadcast_if_small

    toks = docs.select(
        F.col(id_col), *[F.col(c) for c in carry_cols],
        F.explode(tokens(text_col)).alias("word"),
    )
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = broadcast_if_small(vocab, max_rows=vocab_broadcast_max)
    tot = vocab.agg(F.sum("cnt").alias("n"))
    return (
        toks.join(vocab, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col(id_col), *[F.col(c) for c in carry_cols])
        .agg(
            F.avg(-F.log(F.col("cnt").cast("double") / F.col("n"))).alias(
                "surprisal"
            )
        )
    )
