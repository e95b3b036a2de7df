"""pystreams-spark: a PySpark-native analytics engine with the capability
surface of the `thomasahle/pystreams` stream library (see SURVEY.md),
extended with LLM-data-pipeline operators and designed for 100 TB scale.

Public API:
- ``Stream`` — fluent facade over DataFrame (the pystreams-compatible
  surface); every method lowers to DataFrame/Column ops immediately.
- ``get_spark`` — tuned local SparkSession factory.
- ``load_table`` / ``load_tables`` — fixture IO.
- ``QUERIES`` / ``ORACLE`` — the oracle-checked query registry.
"""

from .io import load_table, load_tables
from .session import get_spark
from .stream import Stream

__all__ = ["Stream", "get_spark", "load_table", "load_tables"]
