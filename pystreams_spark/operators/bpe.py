"""Distributed byte-pair-encoding (BPE) tokenizer training — the
subword-vocabulary step of an LLM training-data pipeline (algorithm:
Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units", ACL — public).

Scale shape (the whole point of doing this on Spark): BPE never
iterates over the corpus. One corpus-wide ``groupBy(word)`` collapses
100 TB of text into a *word-frequency table* whose size is the distinct
vocabulary (10^6–10^8 rows at web scale, a few hundred on the test
fixtures). Every merge iteration after that touches only that small
frame:

1. pair count: one narrow explode + partial/final hash-agg over the
   word table (shuffle moves only distinct (left,right) pairs),
2. argmax: ``orderBy(...).limit(1)`` → TakeOrdered, ONE row to the
   driver per iteration,
3. merge apply: a narrow per-row left-fold over the symbol arrays
   (Column algebra ``aggregate`` HOF — interpreted, not codegen'd, but
   it runs over the vocabulary-sized frame, not the corpus, so the
   constant factor is irrelevant; see TODO.md r4 perf note for why we
   care about that distinction).

Tie-breaking is fully deterministic (weight DESC, then left, then
right lexicographically) so training is reproducible across engines and
partitionings — the differential test replays the same algorithm in
pure Python and must match merge-for-merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_freqs", "to_symbols", "pair_counts", "bpe_train", "apply_merges"]


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq) table: the ONLY pass over the corpus.

    Whitespace tokenization (matches ``functions.text.tokens``); empty
    tokens dropped. Partial aggregation makes the shuffle
    vocabulary-sized, not corpus-sized.
    """
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Attach the initial symbol sequence: one single-character symbol
    per char (no end-of-word marker — keeps the SQL oracle simple; a
    marker is just an extra ``concat`` here if a caller wants one)."""
    syms = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(F.col(word_col), i, F.lit(1)),
    )
    return words.withColumn("syms", syms)


def pair_counts(
    words: DataFrame, syms_col: str = "syms", freq_col: str = "freq"
) -> DataFrame:
    """(left, right, weight) — adjacent-symbol pair frequencies weighted
    by word frequency. Narrow explode + hash-agg; the shuffle carries
    only the distinct pairs (map-side combine)."""
    syms = F.col(syms_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("left"),
            F.element_at(syms, i + 1).alias("right"),
        ),
    )
    return (
        words.filter(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("p"), F.col(freq_col).alias("freq"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").cast("long").alias("weight"))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the merged symbol, as a Column-algebra left fold
    (the merge is inherently sequential per word, so ``transform`` can't
    express it; ``aggregate`` can)."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right))
        )
        return F.when(
            can,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def apply_merges(
    words: DataFrame, merges: list[tuple[str, str]], syms_col: str = "syms"
) -> DataFrame:
    """Apply an ordered merge list to the symbol column (narrow; used to
    segment new text with a trained vocabulary)."""
    out = words
    for left, right in merges:
        out = out.withColumn(syms_col, _merge_fold(F.col(syms_col), left, right))
    return out


def _bpe_train_word_table(
    words: DataFrame, num_merges: int, min_freq: int
) -> DataFrame:
    """Run the whole merge loop over the (already vocabulary-sized)
    word table inside ONE executor task — the adaptive small-side of
    ``bpe_train``, mirroring ``dedup._cc_union_find_one_task``: after
    the single corpus pass collapses 100 TB of text into a word-
    frequency table, a table that fits one task needs no further
    cluster coordination, and the distributed loop's ~3 jobs ×
    num_merges barrier latency (pair-count shuffle + argmax collect +
    eager checkpoint per merge) is pure scheduler overhead. Emits one
    combined frame: merge rows (rank .. weight, word NULL) plus final
    word rows (word/freq/syms, rank NULL). Same deterministic
    tie-break (weight DESC, left ASC, right ASC — Python tuple
    compare on str is the same codepoint order as Spark/DuckDB string
    ORDER BY) and the same left-to-right non-overlapping fold as
    ``_merge_fold`` (equality pinned by the pure-Python differential
    test, tests/test_operators.py::_py_bpe)."""
    import pandas as pd

    def kernel(batches):
        wf: list[tuple[str, int, list[str]]] = []
        for pdf in batches:
            for w, f, s in zip(pdf["word"], pdf["freq"], pdf["syms"]):
                wf.append((w, int(f), list(s)))
        merges = []
        for rank in range(1, num_merges + 1):
            pc: dict[tuple[str, str], int] = {}
            for _, f, s in wf:
                for i in range(len(s) - 1):
                    key = (s[i], s[i + 1])
                    pc[key] = pc.get(key, 0) + f
            if not pc:
                break
            (left, right), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_freq:
                break
            merges.append((rank, left, right, left + right, weight))
            for idx, (w, f, s) in enumerate(wf):
                out, i = [], 0
                n = len(s)
                while i < n:
                    if i + 1 < n and s[i] == left and s[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                wf[idx] = (w, f, out)
        yield pd.DataFrame(
            {
                "rank": pd.array(
                    [m[0] for m in merges] + [None] * len(wf), dtype="Int32"
                ),
                "left": [m[1] for m in merges] + [None] * len(wf),
                "right": [m[2] for m in merges] + [None] * len(wf),
                "merged": [m[3] for m in merges] + [None] * len(wf),
                "weight": pd.array(
                    [m[4] for m in merges] + [None] * len(wf), dtype="Int64"
                ),
                "word": [None] * len(merges) + [w for w, _, _ in wf],
                "freq": pd.array(
                    [None] * len(merges) + [f for _, f, _ in wf],
                    dtype="Int64",
                ),
                "syms": [None] * len(merges) + [s for _, _, s in wf],
            }
        )

    return words.coalesce(1).mapInPandas(
        kernel,
        "rank int, left string, right string, merged string, "
        "weight long, word string, freq long, syms array<string>",
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint_dir: str | None = None,
    single_task_vocab: int = 2_000_000,
) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns (merge list, final symbolized word table). Each merge dict:
    {rank, left, right, merged, weight}. Stops early if no pair reaches
    ``min_freq``.

    Adaptive physical strategy (same shape as ``dedup.cc_keep_min``):
    the single corpus pass always runs distributed; the merge loop then
    iterates over a VOCABULARY-sized table. One count of that
    (already-materialized) table decides between (a) vocabulary fits a
    task (≤ ``single_task_vocab`` rows) → the whole loop runs in one
    executor task (``_bpe_train_word_table``, 2 jobs total instead of
    ~3 × num_merges), or (b) web-scale vocabulary → the distributed
    per-merge loop below. Both paths produce bit-identical merges and
    segmentations (same tie-breaks, same fold semantics).

    Distributed-loop driver traffic: exactly ONE row per iteration
    (the argmax). The word table is checkpointed per iteration so the
    lineage stays O(1) instead of stacking ``num_merges`` fold layers
    onto every subsequent job. Checkpoints are EAGER on purpose: the
    argmax is a limit(1) job that may touch only a subset of
    partitions, which would leave a lazy checkpoint unmaterialized and
    silently re-stack the fold lineage.

    ``checkpoint_dir``: by default the per-iteration cut is
    ``localCheckpoint`` — executor-pinned, not fault-tolerant; on a
    real cluster pass a reliable directory so a lost executor at merge
    28/30 doesn't kill the whole training run (``io.materialize``).
    """
    from ..io import materialize

    # lazy: the cutover-deciding count() materializes the pin itself
    words = materialize(
        to_symbols(word_freqs(docs, text_col)), checkpoint_dir, eager=False
    )
    if words.count() <= single_task_vocab:
        combined = materialize(
            _bpe_train_word_table(words, num_merges, min_freq),
            checkpoint_dir,
        )
        learned = [
            {
                "rank": int(r["rank"]),
                "left": r["left"],
                "right": r["right"],
                "merged": r["merged"],
                "weight": int(r["weight"]),
            }
            for r in combined.filter(F.col("rank").isNotNull())
            .orderBy("rank")
            .collect()
        ]
        return learned, combined.filter(F.col("rank").isNull()).select(
            "word", "freq", "syms"
        )
    learned: list[dict] = []
    for rank in range(1, num_merges + 1):
        best = (
            pair_counts(words)
            .orderBy(F.desc("weight"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["weight"] < min_freq:
            break
        left, right, weight = best[0]["left"], best[0]["right"], int(best[0]["weight"])
        learned.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "weight": weight,
            }
        )
        words = materialize(
            words.withColumn("syms", _merge_fold(F.col("syms"), left, right)),
            checkpoint_dir,
        )
    return learned, words


def segment_corpus_report(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Train BPE on the corpus, then measure what the vocabulary buys:
    per-``group_col`` (e.g. language) word/subword/char totals and the
    resulting subwords-per-word and chars-per-subword ratios — the
    numbers a tokenizer team actually tracks when sizing a merge table.

    Scale shape: segmentation happens on the WORD TABLE (vocabulary-
    sized, ``num_merges`` narrow folds), never on the corpus; the
    per-word subword counts then broadcast-join back onto one narrow
    corpus explode. Total corpus passes: exactly two (the training
    word-count and this report's explode) regardless of num_merges.
    """
    merges, words = bpe_train(docs, num_merges, text_col)
    seg = F.broadcast(
        words.select(
            "word",
            F.size("syms").alias("_n_sub"),
            F.length("word").alias("_n_chars"),
        )
    )
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    group = [group_col] if group_col else []
    exploded = docs.select(*group, w).filter(F.col("word") != "")
    # ratio columns in exact integer micros — integer half-up
    # `(2·S·1e6 + q) div (2·q)` — so a ratio of exact integer totals can
    # never land on an exact ROUND half where engines disagree (the r9
    # novelty_budget_selection mismatch class; see queries._avg6_micros)
    return (
        exploded.join(seg, "word")
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n_sub").cast("long").alias("n_subwords"),
            F.sum("_n_chars").cast("long").alias("n_chars"),
            (
                F.expr(
                    "(2 * sum(_n_sub) * 1000000 + count(1))"
                    " div (2 * count(1))"
                ).cast("double")
                / F.lit(1_000_000.0)
            ).alias("subwords_per_word"),
            (
                F.expr(
                    "(2 * sum(_n_chars) * 1000000 + sum(_n_sub))"
                    " div (2 * sum(_n_sub))"
                ).cast("double")
                / F.lit(1_000_000.0)
            ).alias("chars_per_subword"),
        )
    )
