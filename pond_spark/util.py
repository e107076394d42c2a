"""Shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Guarantee minimum parallelism for CPU-heavy per-row stages.

    A small input (one Parquet file → one split) otherwise pins an
    expensive map stage — shingling, fingerprinting, vector scoring,
    media decoding — to a single core. When the scan's file count is
    below the cluster's default parallelism, repartition up; on a real
    cluster where splits already exceed cores this is a no-op, so the
    (tiny) shuffle only ever buys otherwise-idle cores.

    The probe uses ``df.inputFiles()`` — pure metadata. Checking
    ``df.rdd.getNumPartitions()`` instead would be a trap: with AQE
    enabled, ``.rdd`` eagerly materializes the query stages, silently
    executing the whole upstream plan once per call.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df
