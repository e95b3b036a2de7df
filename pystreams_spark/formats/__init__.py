"""File-format codecs implemented from public specifications, plugged
in through the Spark 4 Python DataSource API (SURVEY.md §2.A): formats
whose JVM connector module is absent from the runtime get a spec-level
implementation instead of an env-gated stub."""

from .avro import read_avro, write_avro  # noqa: F401
