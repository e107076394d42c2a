"""Interchange formats for the log table — lossless round-trips
beyond Parquet for feeds that arrive as (or must leave as) ORC, CSV
or JSONL.

The reference's only interchange surfaces are raw datagrams (S7) and
JSONL (S6); an engine replacing it sits between other systems, so the
log schema gets explicit readers/writers for the common columnar
(ORC) and text (CSV, JSONL) formats. All three enforce LOG_SCHEMA on
read — a malformed feed fails loudly at the boundary, not deep inside
a query.

Round-trip notes:
- ORC: lossless (typed columns, native timestamps).
- CSV: timestamps serialized as ISO-8601 with microseconds; empty
  string vs NULL is preserved by writing NULL as an explicit sentinel
  and empty strings QUOTED (an unquoted empty field always reads back
  as null — CSV's classic ambiguity; the reference cares about the
  distinction, F1/F2 empty-site semantics).
- JSONL: reuses the S6 writer semantics (absent-if-null fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pond_spark.schema import LOG_SCHEMA

#: CSV sentinel for NULL so that empty string ("no site") survives a
#: round-trip distinctly from NULL ("field absent")
_NULL = "\\N"
_TS = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_logs_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_logs_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(LOG_SCHEMA).orc(path)


def write_logs_csv(df: DataFrame, path: str, gzip: bool = False) -> None:
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("nullValue", _NULL)
        .option("emptyValue", '""')
        .option("timestampFormat", _TS)
    )
    if gzip:
        w = w.option("compression", "gzip")
    w.csv(path)


def read_logs_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(LOG_SCHEMA)
        .option("header", "true")
        .option("nullValue", _NULL)
        .option("emptyValue", "")
        .option("timestampFormat", _TS)
        .csv(path)
    )
