"""Bucketed tables — co-located joins without a shuffle.

The reference never joins (one table), but the engine's extension
surface (dedup verify joins, enrichment joins, TPC-H-shaped analytics)
repeatedly joins big fact tables on stable keys. Hash-bucketing both
sides on the join key at write time puts matching keys in matching
files, so the join plans with ZERO Exchange on either side — at 100 TB
that's the difference between a cluster-wide shuffle of the fact
tables and a file-local merge.

Spark bucketing requires catalog tables (``saveAsTable``): bucket
metadata lives in the metastore, not in the parquet files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
