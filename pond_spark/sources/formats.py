"""Interchange formats for the log table — lossless round-trips
beyond Parquet for feeds that arrive as (or must leave as) ORC, CSV
or JSONL.

The reference's only interchange surfaces are raw datagrams (S7) and
JSONL (S6); an engine replacing it sits between other systems, so the
log schema gets explicit readers/writers for the common columnar
(ORC) and text (CSV, JSONL) formats. All three enforce LOG_SCHEMA on
read, and the CSV reader runs FAILFAST with header validation — a
malformed or column-reordered feed fails loudly at the boundary, not
deep inside a query.

Round-trip notes:
- ORC: lossless (typed columns, native timestamps).
- CSV: timestamps serialized as ISO-8601 with microseconds; empty
  string vs NULL is preserved by writing NULL as an explicit sentinel
  and empty strings QUOTED (an unquoted empty field always reads back
  as null — CSV's classic ambiguity; the reference cares about the
  distinction, F1/F2 empty-site semantics). Values that COLLIDE with
  the sentinel shape (backslashes + N, which the writer would emit
  unquoted) are escaped by doubling on write and unescaped on read,
  so even a literal "\\N" field survives. multiLine on read keeps
  embedded newlines (quoted by the writer) inside one record.
- JSONL: absent-if-null fields (the S6 writer semantics), schema
  enforced on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pond_spark.schema import LOG_SCHEMA

#: CSV sentinel for NULL so that empty string ("no site") survives a
#: round-trip distinctly from NULL ("field absent")
_NULL = "\\N"
_TS = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_STRING_COLS = [
    f.name for f in LOG_SCHEMA.fields if f.dataType.simpleString() == "string"
]


def write_logs_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_logs_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(LOG_SCHEMA).orc(path)


def _escape_sentinel(df: DataFrame) -> DataFrame:
    # a literal value of only-backslashes-then-N would be written
    # unquoted and read back as the NULL sentinel; double the
    # backslashes on write, strip one on read — classic sentinel
    # escaping, closed under itself
    for c in _STRING_COLS:
        df = df.withColumn(c, F.regexp_replace(c, r"^(\\+N)$", r"\\$1"))
    return df


def _unescape_sentinel(df: DataFrame) -> DataFrame:
    for c in _STRING_COLS:
        df = df.withColumn(c, F.regexp_replace(c, r"^\\(\\+N)$", "$1"))
    return df


def write_logs_csv(df: DataFrame, path: str, gzip: bool = False) -> None:
    w = (
        _escape_sentinel(df)
        .write.mode("overwrite")
        .option("header", "true")
        .option("nullValue", _NULL)
        .option("emptyValue", '""')
        .option("timestampFormat", _TS)
    )
    if gzip:
        w = w.option("compression", "gzip")
    w.csv(path)


def read_logs_csv(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.schema(LOG_SCHEMA)
        .option("header", "true")
        # header names are VALIDATED against LOG_SCHEMA (a reordered
        # interchange feed fails instead of silently mis-assigning
        # same-typed columns), and any parse error raises rather than
        # becoming NULL/shifted rows
        .option("enforceSchema", "false")
        .option("mode", "FAILFAST")
        # the writer quotes embedded newlines; without multiLine the
        # reader would split such a record at the physical line break
        .option("multiLine", "true")
        .option("nullValue", _NULL)
        .option("emptyValue", "")
        .option("timestampFormat", _TS)
        .csv(path)
    )
    return _unescape_sentinel(df)


def write_logs_jsonl(df: DataFrame, path: str, gzip: bool = False) -> None:
    """Schema-keyed JSONL (absent-if-null fields). NB this is the
    INTERCHANGE shape — raw LOG_SCHEMA field names, lossless against
    read_logs_jsonl; the S6 display sink (sinks.write_jsonl) emits the
    reference client's FormatJson key set instead."""
    # default JSON timestampFormat truncates to milliseconds; the
    # engine's canonical order is (timestamp, id), so sub-millisecond
    # loss could reorder records after a round-trip — write/read the
    # same microsecond format the CSV path already pins
    w = df.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    )
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path, ignoreNullFields=True)


def read_logs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(LOG_SCHEMA)
        .option("mode", "FAILFAST")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
