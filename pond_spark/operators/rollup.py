"""Time-bucketed rollups: the hypertable-style aggregation layer.

Not part of the reference surface (pond has no aggregation protocol —
SURVEY.md §2.7); this is the engine-level operator a log store needs
for dashboards: per-bucket, per-dimension aggregates with map-side
partial aggregation and a single shuffle on (bucket, dims). At 100 TB
the bucket column aligns with the store's date partitioning, so
rollups over a time range only scan their days.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_by_time(
    df: DataFrame,
    every: str = "hour",
    dims: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Aggregate into ``date_trunc(every)`` buckets per ``dims``.

    ``aggs`` maps output names to aggregate Columns (default: row
    count). Rows without a timestamp are excluded (no bucket).
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    bucket = F.date_trunc(every, F.col(ts_col)).alias("bucket")
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(bucket, *[F.col(d) for d in dims])
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )


def with_deltas(
    df: DataFrame,
    partition: Sequence[str],
    order: str,
    cols: Sequence[str],
) -> DataFrame:
    """Append ``<col>_delta`` = value − previous value per partition
    (LAG window). One shuffle on the partition keys; first row per
    partition gets NULL deltas. The standard rate-of-change step over
    a time rollup (requests/hour delta per site, etc.)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*partition).orderBy(order)
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}_delta", F.col(c) - F.lag(F.col(c)).over(w)
        )
    return out


def day_over_day_retention(
    df: DataFrame,
    ts_col: str = "timestamp",
    user_col: str = "remote_host",
) -> DataFrame:
    """Per day: active users and how many were also active the
    previous day. Two narrow shuffles: distinct (day, user), then a
    self-join on (user, day−1) folded into one count aggregate."""
    days = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(
            F.to_date(F.col(ts_col)).alias("day"), F.col(user_col).alias("u")
        )
        .distinct()
    )
    prev = days.select(F.date_add(F.col("day"), 1).alias("day"), F.col("u"))
    joined = days.join(
        prev.withColumn("_ret", F.lit(1)), on=["day", "u"], how="left"
    )
    return (
        joined.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.coalesce(F.col("_ret"), F.lit(0))).alias("retained_users"),
        )
        # retention_ppm is exact integer arithmetic (parts-per-million,
        # floor division) so it hashes identically across engines;
        # retention is the human-friendly double (rounding a double can
        # land on a representation tie and differ in the last digit
        # between engines, so cross-engine checks should use the ppm).
        .withColumn(
            "retention_ppm",
            F.expr("retained_users * 1000000 DIV active_users"),
        )
        .withColumn(
            "retention",
            F.round(
                F.col("retained_users").cast("double")
                / F.col("active_users").cast("double"),
                6,
            ),
        )
    )


def rollup_hierarchy(
    df: DataFrame,
    every: str = "hour",
    dims: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """ROLLUP over (bucket, *dims): every prefix level of the hierarchy
    — (bucket, d1, d2), (bucket, d1), (bucket), () — in ONE pass.

    Spark expands ROLLUP into a single Expand + hash-aggregate: one
    shuffle computes all grouping levels (map-side partials included),
    versus one job per level if the caller unioned separate groupBys.
    ``grouping_id()`` is exposed as ``gid`` so consumers (and the
    DuckDB oracle twin, which numbers levels identically) can tell an
    aggregated-out NULL from a data NULL — the standard cube
    disambiguator.
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    bucket = F.date_trunc(every, F.col(ts_col)).alias("bucket")
    dim_cols = [F.col(d) for d in dims]
    return (
        df.filter(F.col(ts_col).isNotNull())
        .rollup(bucket, *dim_cols)
        .agg(
            F.grouping_id().alias("gid"),
            *[c.alias(name) for name, c in aggs.items()],
        )
    )
