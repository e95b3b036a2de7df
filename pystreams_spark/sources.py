"""Custom Python data sources (Spark 4 ``pyspark.sql.datasource`` API,
SURVEY.md §2.A extensibility): when a corpus lives behind an API, a
proprietary format, or a generator, the Spark-first answer is a custom
DataSource — the driver plans InputPartitions, every executor reads its
partitions in parallel, and the result is a normal DataFrame that all
downstream operators (pushdown excepted) treat like any scan.

``SyntheticDocsDataSource`` is the reference implementation: a seeded,
deterministic document generator (same shape as the ``documents``
fixture) that scales to any row count with zero driver data movement —
each partition derives its rows from (seed, partition_id) alone. At
100 TB-scale ingestion the same skeleton wraps a real upstream (object
listing in ``partitions()``, fetch/decode in ``read()``).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "order data column join small line customer query big stream group "
    "vector window filter sort the a"
).split()
_LANGS = ("en", "de", "es", "fr", "zh")


class _DocsPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int, seed: int):
        self.index = index
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        # pushdown state (pushFilters runs before partitions when the
        # plan has filters; these defaults apply otherwise)
        self._lo = 0
        self._hi = self.n_rows
        self._lang = None

    def pushFilters(self, filters):
        """Spark 4.1 filter pushdown into a Python DataSource: doc_id
        range predicates clamp the generated id range — PARTITION
        PRUNING inside the source, planned partitions shrink before any
        executor runs — and a lang equality is applied row-side in
        read(). Everything else is returned unconsumed, and Spark
        re-applies it above the scan (the standard best-effort
        contract, same as parquet's)."""
        remaining = []
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("doc_id",):
                self._lo = max(self._lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("doc_id",):
                self._lo = max(self._lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("doc_id",):
                self._hi = min(self._hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("doc_id",):
                self._hi = min(self._hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("doc_id",):
                self._lo = max(self._lo, int(f.value))
                self._hi = min(self._hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("lang",):
                self._lang = str(f.value)
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        # even row ranges over the full id space, each clamped to the
        # pushed-down [lo, hi) window, empties dropped — the generated
        # data is a pure function of doc_id, so pruning ranges cannot
        # change row content. At scale this is where you list
        # files/shards and skip those outside the predicate.
        per = -(-self.n_rows // self.n_parts)
        parts = []
        for i in range(self.n_parts):
            start = max(i * per, self._lo)
            end = min((i + 1) * per, self.n_rows, self._hi)
            if start < end:
                parts.append(_DocsPartition(i, start, end, self.seed))
        return parts

    def read(self, partition):
        # runs ON THE EXECUTOR: derive rows purely from (seed, doc_id)
        # so any partitioning of the id space yields identical data
        import numpy as np

        rng = np.random.RandomState(self.seed + partition.index)
        for doc_id in range(partition.start, partition.end):
            lang = _LANGS[doc_id % len(_LANGS)]
            if self._lang is not None and lang != self._lang:
                continue
            r = np.random.RandomState((self.seed * 1_000_003 + doc_id) % (2**31))
            n_tokens = 20 + int(r.randint(0, 40))
            words = [_WORDS[int(w)] for w in r.randint(0, len(_WORDS), n_tokens)]
            yield (doc_id, " ".join(words), lang)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N).load()``
    after ``register_data_sources(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id long, text string, lang string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


class _EventsRangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batch source — the Kafka-shaped contract
    (monotonic offsets, replayable ranges, partition-parallel reads)
    over a deterministic generator. ``latestOffset`` advances by
    ``rows_per_batch`` per poll; a given offset range always yields the
    same rows, so checkpoint recovery replays exactly (the property
    Structured Streaming's exactly-once sink contract builds on)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        # Restart safety. partitions() fast-forwards the in-memory
        # counter from the checkpointed range, which covers restarts
        # with an uncommitted batch to replay. But if a query stops in
        # the window AFTER the final batch's commit-log write and
        # restarts, Spark calls latestOffset() FIRST (nothing to
        # replay) — with only in-memory state that would return an
        # offset behind the checkpointed position, and a later restart
        # from that regressed offset re-reads committed ranges
        # (duplicates at an exactly-once sink). A real source asks the
        # external system for its floor; this synthetic one can
        # optionally persist it: pass ``state_dir`` and commit() writes
        # the committed offset durably, __init__ reads it back as the
        # floor. Without state_dir the race window remains (documented
        # limitation of the in-memory demo configuration).
        self._state_path = None
        state_dir = options.get("state_dir")
        if state_dir:
            import os

            os.makedirs(state_dir, exist_ok=True)
            self._state_path = os.path.join(state_dir, "committed_offset")
        self._latest = self._read_floor()

    def _read_floor(self) -> int:
        if self._state_path:
            try:
                with open(self._state_path) as f:
                    return int(f.read().strip() or 0)
            except (OSError, ValueError):
                return 0
        return 0

    def _write_floor(self, offset: int) -> None:
        if self._state_path and offset > self._read_floor():
            import os

            tmp = f"{self._state_path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(str(offset))
            os.replace(tmp, self._state_path)  # atomic on POSIX

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._latest += self.rows_per_batch
        return {"offset": self._latest}

    def partitions(self, start, end):
        s, e = start["offset"], end["offset"]
        # restart safety: after recovery the in-memory advance counter
        # restarts at 0 while the checkpointed start may be far ahead —
        # fast-forward so the next latestOffset() continues from the
        # recovered position instead of handing Spark end < start
        self._latest = max(self._latest, s, e)
        if e <= s:
            return []
        per = max(-(-(e - s) // self.n_parts), 1)
        return [
            _EventsRangePartition(s + i * per, min(s + (i + 1) * per, e), self.seed)
            for i in range(self.n_parts)
            if s + i * per < e
        ]

    def read(self, partition):
        import numpy as np

        for event_id in range(partition.start, partition.end):
            r = np.random.RandomState((partition.seed * 999_983 + event_id) % (2**31))
            yield (
                event_id,
                int(r.randint(0, 1000)),
                ("click", "view", "purchase", "scroll")[int(r.randint(0, 4))],
            )

    def commit(self, end):
        # ranges are derivable forever (nothing to clean up); keep the
        # advance counter monotonic with what the engine has committed,
        # and durably when state_dir is configured (closes the
        # stop-after-final-commit restart race — see __init__)
        self._latest = max(self._latest, end["offset"])
        self._write_floor(self._latest)


class SyntheticEventsStreamSource(DataSource):
    """``spark.readStream.format("synthetic_events").load()`` after
    ``register_data_sources(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string"

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_data_sources(spark) -> None:
    """Idempotent registration of all custom sources on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEventsStreamSource)


class _ManifestCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class ManifestJsonWriter(DataSourceWriter):
    """Two-phase-commit batch sink (Spark 4 Python DataSourceWriter):
    each task writes its partition to a TEMPORARY json-lines file and
    returns a commit message; only the driver-side ``commit`` publishes
    the files (atomic rename) and writes a ``_MANIFEST.json`` naming
    every published file + row counts. A failed/speculative task's
    temp file is never named by the manifest, and ``abort`` removes
    temps — the visibility contract object-store pipelines need
    (readers trust the manifest, not directory listings). The same
    skeleton wraps any exactly-once external sink: stage in write(),
    publish in commit(), clean in abort()."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_json sink requires option 'path'")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _ManifestCommit(tmp, n)

    def commit(self, messages):
        import json
        import os

        files = []
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            files.append({"file": os.path.basename(final), "rows": m.rows})
        manifest = {
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class ManifestJsonSink(DataSource):
    """Register with ``spark.dataSource.register(ManifestJsonSink)``;
    write via ``df.write.format("manifest_json").option("path", p)
    .mode("append").save()``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_json"

    def writer(self, schema, overwrite: bool) -> ManifestJsonWriter:
        return ManifestJsonWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return ManifestJsonStreamWriter(self.options)


class ManifestJsonStreamWriter(DataSourceStreamWriter):
    """Streaming flavor of the manifest sink: per micro-batch, tasks
    stage temp files and the driver publishes them under an
    epoch-scoped manifest (``_MANIFEST-<epoch>.json``). Exactly-once
    follows from the engine's contract — a replayed epoch re-runs
    write() and commit() with the SAME epoch id, and publish is an
    atomic rename + manifest overwrite, so readers that union the
    manifests see each epoch's data exactly once no matter how many
    times it was attempted. abort() drops that epoch's staged temps."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_json stream sink requires option 'path'")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ManifestCommit(tmp, n)

    def commit(self, messages, batchId=None):
        import json
        import os

        files = []
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"epoch-{batchId:05d}-part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            files.append({"file": os.path.basename(final), "rows": m.rows})
        manifest = {
            "epoch": batchId,
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId:05d}.json"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId=None):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
