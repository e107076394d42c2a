"""STATS (S11/A4): server counters as an aggregation over the store.

Reference: /root/reference/src/Protocol.hxx:240-264 and
src/Instance.cxx:51-62 — memory capacity/usage, n_records, plus ingest
counters (n_received / n_malformed / n_discarded, kept by the receiver
at src/Receiver.cxx:25-42).

In the Spark engine the store is Parquet; n_records and size come from
an aggregate over the table, ingest counters from the ingest-metrics
table maintained by pond_spark.sources.ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats(
    logs: DataFrame,
    size_cols: list[str] | None = None,
    metrics: DataFrame | None = None,
) -> DataFrame:
    """One-row frame: n_records plus approximate memory_usage (sum of
    string-column lengths — the Parquet analog of the reference's
    arena usage). Pass the ingest-metrics table (see
    ``sources.ingest.ingest_batch(metrics_dir=...)`` /
    ``streaming.ingest.ingest_stream``) as ``metrics`` to fold in the
    receiver counters — full STATS parity with the reference's
    n_received / n_malformed / n_discarded."""
    size_cols = size_cols or [
        f.name for f in logs.schema.fields if f.dataType.simpleString() == "string"
    ]
    usage = None
    for c in size_cols:
        term = F.coalesce(F.length(F.col(c)).cast("long"), F.lit(0))
        usage = term if usage is None else usage + term
    aggs = [F.count(F.lit(1)).alias("n_records")]
    if usage is not None:
        aggs.append(F.sum(usage).alias("memory_usage"))
    out = logs.agg(*aggs)
    if metrics is not None:
        out = out.crossJoin(ingest_stats(metrics))
    return out


def ingest_stats(metrics: DataFrame) -> DataFrame:
    """Fold the ingest-metrics table (one row per ingest batch with
    n_received/n_malformed/n_discarded) into the STATS totals."""
    return metrics.agg(
        F.sum("n_received").alias("n_received"),
        F.sum("n_malformed").alias("n_malformed"),
        F.sum("n_discarded").alias("n_discarded"),
    )
