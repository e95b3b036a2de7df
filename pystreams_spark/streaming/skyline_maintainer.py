"""Streaming Pareto-frontier maintainer: fold every micro-batch into
the CURRENT skyline (operators/topk.pareto_frontier) without ever
rescanning history — the streaming face of the batch skyline analytic
(e.g. `part_price_size_skyline`).

Soundness comes from the skyline's fold property:
``skyline(A ∪ B) = skyline(skyline(A) ∪ B)`` — a row dominated by any
row is dominated by some FRONTIER row (transitivity), so folding each
batch against the kept frontier loses nothing. The state is therefore
the frontier itself — KBs for correlated data — and per-epoch cost is
``pareto_frontier(frontier ∪ batch)``, never corpus-sized.

Design, mirroring `streaming/stats_maintainer`:

- epoch N's folded frontier lands in ``{state_dir}/state/epoch=N``
  with idempotent overwrite (a COMPLETED epoch — `_SUCCESS` present —
  is never rewritten, so replays are exactly-once on replayable
  sources, same contract as StatsMaintainer);
- each epoch folds against the LATEST COMMITTED epoch before it, so a
  failed first attempt can never feed a partial frontier forward;
- ``current(spark)`` returns the latest committed frontier.

Use with ``stream.writeStream.foreachBatch(m.foreach_batch())``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.topk import pareto_frontier

__all__ = ["SkylineMaintainer"]


class SkylineMaintainer:
    def __init__(self, state_dir: str, dims: Sequence[tuple[str, str]]):
        if not dims:
            raise ValueError("SkylineMaintainer needs at least one (col, dir) dim")
        self.state_dir = state_dir.rstrip("/")
        self.dims = [(c, d) for c, d in dims]

    def _fs_and_path(self, spark: SparkSession, path: str):
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return fs, p

    def _committed_epochs(self, spark: SparkSession) -> list[int]:
        fs, p = self._fs_and_path(spark, f"{self.state_dir}/state")
        if not fs.exists(p):
            return []
        out = []
        for status in fs.listStatus(p):
            name = status.getPath().getName()
            if not name.startswith("epoch="):
                continue
            fs2, mp = self._fs_and_path(
                spark, status.getPath().toString() + "/_SUCCESS"
            )
            if fs2.exists(mp):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        part = f"{self.state_dir}/state/epoch={int(epoch_id)}"
        fs, p = self._fs_and_path(spark, part + "/_SUCCESS")
        if fs.exists(p):
            return  # completed epoch: replay is a no-op (exactly-once)
        prev_epochs = [e for e in self._committed_epochs(spark) if e < int(epoch_id)]
        merged = batch
        if prev_epochs:
            prev = spark.read.parquet(
                f"{self.state_dir}/state/epoch={prev_epochs[-1]}"
            )
            merged = prev.select(batch.columns).unionByName(batch)
        frontier = pareto_frontier(merged, self.dims)
        frontier.coalesce(1).write.mode("overwrite").parquet(part)

    def foreach_batch(self):
        return self.process_batch

    def current(self, spark: SparkSession) -> DataFrame:
        """The latest committed frontier. Raises before the first epoch
        commits (nothing to publish yet)."""
        epochs = self._committed_epochs(spark)
        if not epochs:
            raise ValueError(
                f"SkylineMaintainer: no committed state under "
                f"{self.state_dir}/state yet — current() is only "
                "meaningful after the first micro-batch commits"
            )
        return spark.read.parquet(f"{self.state_dir}/state/epoch={epochs[-1]}")
