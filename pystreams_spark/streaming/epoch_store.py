"""Shared epoch-partitioned state-store reader for the foreachBatch
ingests (SURVEY §2.I) — the ``_SUCCESS`` commit filter, hardened
(ADVICE r10).

The ingests (`NeardupIngest`, `NoveltyIngest`, `ImagedupIngest`) write
their cross-batch state as ``<root>/epoch=<n>/`` parquet directories
and read back "everything committed strictly before the current
epoch". A crash mid-write leaves an ``epoch=N`` directory without its
``_SUCCESS`` marker; the streaming checkpoint then REPLAYS batch N
under the same epoch id, so the torn directory is (a) excluded from
the store read by the epoch bound itself and (b) overwritten by the
replay. That makes the marker filter a backstop — and it means a
marker-less directory STRICTLY OLDER than the replay horizon is not a
torn write at all: nothing will ever rewrite it, so silently skipping
it would silently disable cross-batch dedup for those signatures (the
exact silent-recall-hole this store exists to prevent). Two
non-crash ways to get there, both configuration bugs, both now fail
loudly instead of silently:

- ``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` — every
  epoch is marker-less, the store reads as permanently empty.
  ``assert_markers_enabled`` refuses at ingest init.
- object-store lifecycle cleanup deleting zero-byte ``_SUCCESS``
  objects — the directory still holds committed-looking ``part-*``
  files. ``committed_epoch_dirs`` raises naming the directory.

A marker-less old directory with NO part files (crash between mkdir
and the first task commit) genuinely carries no data and is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["assert_markers_enabled", "committed_epoch_dirs", "read_epoch_store"]

_MARK_KEY = "mapreduce.fileoutputcommitter.marksuccessfuljobs"


def assert_markers_enabled(spark: SparkSession, who: str) -> None:
    """Refuse to run an epoch-store ingest in a session configured NOT
    to write ``_SUCCESS`` markers — the commit filter would read every
    epoch as uncommitted and cross-batch state would be silently
    empty forever."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    val = conf.get(_MARK_KEY, "true")
    if str(val).strip().lower() == "false":
        raise RuntimeError(
            f"{who}: the session sets {_MARK_KEY}=false, so epoch "
            "commits would never be marked and the cross-batch "
            "signature store would read as permanently empty. Re-enable "
            "_SUCCESS markers (or use a different committer contract)."
        )


def committed_epoch_dirs(
    spark: SparkSession, root: str, before_epoch: int, who: str
) -> list[str]:
    """Paths of every ``epoch=N`` directory under ``root`` with
    ``N < before_epoch`` and a ``_SUCCESS`` marker. Marker-less old
    directories containing ``part-*`` files raise (committed-looking
    data that would otherwise silently drop out of dedup); marker-less
    EMPTY directories are skipped as torn. Missing ``root`` → []."""
    jvm = spark.sparkContext._jvm
    root_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = root_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(root_path):
        return []
    committed: list[str] = []
    for status in fs.listStatus(root_path):
        name = status.getPath().getName()
        if not name.startswith("epoch="):
            continue
        try:
            epoch = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if epoch >= before_epoch:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        if fs.exists(marker):
            committed.append(status.getPath().toString())
            continue
        parts = [
            f.getPath().getName()
            for f in fs.listStatus(status.getPath())
            if f.getPath().getName().startswith("part-")
        ]
        if parts:
            raise RuntimeError(
                f"{who}: epoch directory {status.getPath()} has no "
                f"_SUCCESS marker but holds {len(parts)} committed-"
                "looking part file(s), and it is older than the replay "
                "horizon so no replay will ever rewrite it. Reading on "
                "would silently drop its signatures from cross-batch "
                "dedup. Restore the marker (touch _SUCCESS) after "
                "verifying the files, or delete the directory to "
                "discard the epoch."
            )
        # empty marker-less dir: torn between mkdir and first task
        # commit — carries no data, safe to skip
    return committed


def read_epoch_store(
    spark: SparkSession, root: str, before_epoch: int, who: str
) -> DataFrame | None:
    """The store as of (strictly before) ``before_epoch``; None when
    nothing committed yet."""
    committed = committed_epoch_dirs(spark, root, before_epoch, who)
    if not committed:
        return None
    return spark.read.parquet(*committed)
