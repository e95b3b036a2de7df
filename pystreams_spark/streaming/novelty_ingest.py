"""Continuous n-gram NOVELTY scoring of a document stream: each
arriving document is scored against every gram seen before it — the
streaming face of `operators/dedup.ngram_novelty_scores` for the
"corpus grows forever" shape (the ingest-time marginal-content signal
a crawl pipeline reads to down-weight or drop mostly-seen feeds
BEFORE paying to store them).

Per micro-batch (driven by ``foreachBatch``):

1. gram once: the production hashed-gram construction (word n-gram →
   xxhash64 inside the per-doc array, Column algebra only — identical
   classes to ``ngram_novelty_scores(hash_grams=True)``),
2. intra-batch first-seen: per-gram MIN(doc id) inside the batch,
3. cross-batch: a gram is NOVEL iff its batch-first doc owns it AND
   the gram is absent from the accumulated GRAM STORE (parquet,
   partitioned by epoch, 8 bytes per distinct gram — no text),
4. per-doc novelty = novel grams / distinct grams, emitted to
   ``out/epoch=<n>``,
5. state update: exactly the grams first seen THIS epoch append to
   ``grams/epoch=<n>``; under replay the store read prunes to
   ``epoch < e``, so a recomputed batch sees its original view and
   rewrites identical output — exactly-once.

Semantics vs the batch operator (stated, not hidden): batch novelty
attributes each gram to the MINIMUM doc id; the online rule attributes
it to the first ARRIVAL. When documents arrive in id order (backfills,
monotonic ingest ids) the two are equal — pinned by the equivalence
test; out-of-order arrival keeps the arrival-order contract, the only
one an online scorer can honor.

Scale posture: state is one 8-byte column, partition-pruned by epoch;
the per-batch join is a gram-keyed left-anti against the store — at
corpus scale bucket the store by gram hash so the anti-join prunes,
and compact old epochs periodically (``io.compact_parquet``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["NoveltyIngest"]


class NoveltyIngest:
    """Stateful novelty scorer over ``state_dir``. Use
    ``process_batch`` directly or attach to a stream:

        q = (stream.writeStream.foreachBatch(ing.foreach_batch())
             .option("checkpointLocation", ckpt).start())

    Scored rows land in ``{state_dir}/out/epoch=<n>/``.
    """

    def __init__(
        self,
        state_dir: str,
        n: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.state_dir = state_dir.rstrip("/")
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def _params(self) -> dict:
        return {"n": self.n, "text_col": self.text_col, "id_col": self.id_col}

    def _check_params(self, spark: SparkSession) -> None:
        """Same guard as NeardupIngest: a changed gram width against an
        existing store would silently mis-score every later doc. Also
        refuses a session configured not to write ``_SUCCESS`` markers
        (ADVICE r10)."""
        import json

        from .epoch_store import assert_markers_enabled

        assert_markers_enabled(spark, "NoveltyIngest")
        # r12: memoized after first success (file immutable, written
        # only here) — was one read job + collect EVERY micro-batch
        if getattr(self, "_params_checked", False):
            return

        from pyspark.errors import AnalysisException

        path = f"{self.state_dir}/_params"
        try:
            stored = json.loads(
                spark.read.text(path).agg(
                    F.concat_ws("", F.collect_list("value"))
                ).first()[0]
            )
        except AnalysisException:
            spark.createDataFrame(
                [(json.dumps(self._params(), sort_keys=True),)], "value string"
            ).coalesce(1).write.mode("overwrite").text(path)
            self._params_checked = True
            return
        if stored != self._params():
            raise ValueError(
                f"NoveltyIngest: state at {self.state_dir} was built with "
                f"{stored}, current instance uses {self._params()} — gram "
                "classes would not match. Use the original parameters or a "
                "fresh state_dir."
            )
        self._params_checked = True

    def _store(self, spark: SparkSession, before_epoch: int) -> DataFrame | None:
        """Gram store strictly before ``before_epoch``; None when empty.

        Commit filter (r10, ADVICE r9; hardened r11 via the shared
        `epoch_store`): committed epochs are read, torn (empty
        marker-less) epochs are skipped, and a marker-less OLD epoch
        holding part files raises instead of silently dropping its
        grams (same pattern as ``StatsMaintainer.current``). The epoch
        bound is applied on the directory NAME, so no partition column
        is materialized."""
        from .epoch_store import read_epoch_store

        return read_epoch_store(
            spark, f"{self.state_dir}/grams", before_epoch, "NoveltyIngest"
        )

    def scores(self, spark: SparkSession) -> DataFrame:
        """All scored rows emitted so far (union of epoch outputs)."""
        return spark.read.parquet(f"{self.state_dir}/out")

    def _batch_posts(self, batch: DataFrame) -> DataFrame:
        """(id, g) with g = xxhash64 of each DISTINCT word n-gram —
        the `hash_grams=True` construction, verbatim."""
        from ..functions.text import tokens

        n, id_col = self.n, self.id_col
        base = batch.select(
            F.col(id_col), tokens(F.col(self.text_col)).alias("_toks")
        )
        grams = base.select(
            id_col,
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size("_toks") - (n - 1), F.lit(1)),
                    ),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("_toks"), i, n))
                    ),
                )
            ).alias("_grams"),
        )
        return grams.select(id_col, F.explode("_grams").alias("g"))

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        id_col, epoch_id = self.id_col, int(epoch_id)
        self._check_params(spark)

        # one gram pass, pinned: posts feed first-seen, novelty AND the
        # state append (three consumers)
        posts = self._batch_posts(batch).localCheckpoint(eager=True)
        batch_first = posts.groupBy("g").agg(F.min(id_col).alias("_first"))

        store = self._store(spark, epoch_id)
        if store is not None:
            fresh = batch_first.join(
                store.select("g"), "g", "left_anti"
            )
        else:
            fresh = batch_first
        # fresh: grams first seen THIS epoch, attributed to their
        # batch-first doc; pinned — consumed by the score join and the
        # state write, and the anti-join must not replay per consumer
        fresh = fresh.localCheckpoint(eager=True)

        scored = (
            posts.join(
                fresh.withColumnRenamed("_first", "_novel_owner"),
                "g",
                "left",
            )
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(
                    (F.col("_novel_owner") == F.col(id_col)).cast("long")
                ).alias("novel_grams"),
            )
            .fillna({"novel_grams": 0})
            .withColumn(
                "novelty",
                F.round(F.col("novel_grams") / F.col("n_grams"), 6),
            )
        )

        # idempotent epoch writes: the store read above never sees its
        # own epoch, so a replayed batch recomputes the SAME fresh set
        # and the same scores
        fresh.select("g").write.mode("overwrite").parquet(
            f"{self.state_dir}/grams/epoch={epoch_id}"
        )
        scored.write.mode("overwrite").parquet(
            f"{self.state_dir}/out/epoch={epoch_id}"
        )

    def foreach_batch(self):
        return self.process_batch
