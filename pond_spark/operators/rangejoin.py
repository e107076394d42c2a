"""Generic point-in-interval range join — the bucketed broadcast
strategy behind the GeoIP enrichment (functions/geoip.py,
P4 / ResultWriter.cxx:177-192), generalized to any numeric point
column against any interval dimension (price epochs, value bands,
maintenance windows, session spans).

Why not a plain ``point BETWEEN start AND end`` join: Catalyst plans a
non-equi broadcast join as a nested-loop probe — O(rows × ranges),
unusable against a real dimension at log scale. Here every interval
explodes into the fixed-width buckets it overlaps (short intervals →
tiny fan-out) and the probe equi-joins on its own bucket: a
BroadcastHashJoin with a residual between-predicate, O(rows ×
ranges-per-bucket), and the fact table never shuffles.

Timestamps: cast to epoch seconds/micros first (the caller chooses
the resolution); the operator is deliberately numeric-only so the
bucket arithmetic stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every interval containing its point
    (``start <= point <= end``, inclusive both ends — the F5/F7
    convention). ``how`` ∈ {inner, left}; left keeps pointless facts
    with NULL interval columns. ``bucket_width`` trades dimension
    replication (wide buckets) against ranges probed per row (narrow
    buckets); set it near the typical interval length."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = F.col(point_col)
    probe = facts.withColumn(
        "_bkt", F.floor(p / F.lit(bucket_width)).cast("long")
    )
    dim = intervals.withColumn(
        "_gbkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    cond = (
        (F.col("_bkt") == F.col("_gbkt"))
        & (p >= F.col(start_col))
        & (p <= F.col(end_col))
    )
    return probe.join(F.broadcast(dim), cond, how).drop("_bkt", "_gbkt")
