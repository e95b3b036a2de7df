"""Sequence packing for training-data pipelines (SURVEY.md §2.K
extension): assign documents to fixed-token-budget bins (the packing
step that turns a deduped corpus into dense training sequences).

Distributed strategy: greedy first-fit-decreasing WITHIN each
partition (a vectorized kernel pass — no shuffle of document text),
with bin ids namespaced by partition id so ids never collide across
executors. Packing quality is a local property (each partition packs
its own documents densely); global optimality is NP-hard and never
required — what matters at 100 TB is that no sequence exceeds the
budget and fill stays high, both invariant-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import ensure_parallelism


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a ``bin_id`` such that each bin's summed
    ``token_col`` stays ≤ ``max_tokens`` (a document longer than the
    budget gets a bin of its own — the caller decides whether to
    truncate or split upstream).

    Returns (id, n_tokens, bin_id, bin_fill) where bin_fill is the
    bin's total AFTER packing — carrying the invariant in the output
    makes violations visible to rows-only checks. One narrow kernel
    pass; bin ids are (partition_id << 32) | local_bin.
    """
    import numpy as np
    import pandas as pd

    tagged = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.col(token_col).cast("long").alias("_tok"))
        .withColumn("_pid", F.spark_partition_id())
    )

    def pack(batches):
        rows_id, rows_tok, rows_bin = [], [], []
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            rows_id.append(pdf[id_col].to_numpy())
            rows_tok.append(pdf["_tok"].to_numpy(dtype=np.int64))
        if pid is None:
            return
        ids = np.concatenate(rows_id)
        toks = np.concatenate(rows_tok)
        # first-fit-decreasing: sort big→small, drop each doc into the
        # first bin with room (linear scan over open bins kept in an
        # array; bins fill fast so the scan stays short)
        order = np.argsort(-toks, kind="stable")
        bin_of = np.empty(len(ids), dtype=np.int64)
        fills: list = []
        for i in order:
            t = int(toks[i])
            placed = False
            if t < max_tokens:
                for b, f in enumerate(fills):
                    if f + t <= max_tokens:
                        fills[b] = f + t
                        bin_of[i] = b
                        placed = True
                        break
            if not placed:
                bin_of[i] = len(fills)
                fills.append(t)
        fills_arr = np.asarray(fills, dtype=np.int64)
        base = np.int64(pid) << np.int64(32)
        yield pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": toks,
                "bin_id": base | bin_of,
                "bin_fill": fills_arr[bin_of],
            }
        )

    return tagged.mapInPandas(
        pack, f"{id_col} long, n_tokens long, bin_id long, bin_fill long"
    )


def pack_sequences_contiguous(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic, partitioning-INDEPENDENT packing: documents in the
    fixed global order (tokens desc, id) form contiguous bins at budget
    multiples — ``bin_id = floor(cumsum_before / max_tokens)``. A
    boundary-straddling document stays with the bin it started in, so a
    bin's fill can exceed the budget by less than one document (and
    under-fills never exceed one document either) — the semantics of
    budget-aligned contiguous sharding, stated up front instead of the
    NP-hard optimum.

    Why it exists next to ``pack_sequences``: the FFD variant packs
    tighter but namespaces bin ids by partition (output depends on
    physical layout → rows-only checkable); this one's output is a pure
    function of the data — same bins on any cluster, any partition
    count, any engine — which makes it SQL-oracle-checkable and
    reproducible run-to-run. The cumsum is the distributed two-pass
    window-free form (``selection.ordered_cumsum``): one range shuffle
    + broadcast offsets, no single-partition Window cliff; the
    ``bin_fill`` column is one hash-partitioned window over narrow
    (id, tokens, bin) rows.

    Returns (id, n_tokens, bin_id, bin_fill).
    """
    from pyspark.sql import Window

    from .selection import ordered_cumsum

    base = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias("n_tokens")
    )
    cum = ordered_cumsum(
        base,
        [F.col("n_tokens").desc(), F.col(id_col)],
        "n_tokens",
        out_col="_cum",
    )
    binned = cum.withColumn(
        "bin_id",
        F.floor((F.col("_cum") - F.col("n_tokens")) / max_tokens).cast("long"),
    )
    fill = F.sum("n_tokens").over(Window.partitionBy("bin_id"))
    return binned.select(
        id_col,
        "n_tokens",
        "bin_id",
        fill.cast("long").alias("bin_fill"),
    )
