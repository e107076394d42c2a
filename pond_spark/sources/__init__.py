from pond_spark.sources.ingest import (
    IngestResult,
    ingest_batch,
    parse_datagrams,
    rate_limit,
)
from pond_spark.sources.bucketing import read_table, write_bucketed
from pond_spark.sources.retention import apply_retention
from pond_spark.sources.store import LogStore

__all__ = [
    "parse_datagrams",
    "rate_limit",
    "ingest_batch",
    "IngestResult",
    "apply_retention",
    "LogStore",
    "write_bucketed",
    "read_table",
]
