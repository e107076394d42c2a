"""CUSUM change detection over time-rollup series — the monitoring
layer a 100 TB log pipeline runs on top of its hourly rollups
(operators/rollup.py): detect sustained traffic shifts per site
without a model, in one pass.

The textbook one-sided CUSUM recursion ``s_t = max(0, s_{t-1} +
(x_t - k))`` (Page 1954 — the same E.S. Page the reference engine's
namesake family of tests descends from) looks sequential, but has the
classic prefix-scan closed form::

    s_t = runsum_t - min(0, min_{j<=t} runsum_j),  runsum_t = Σ (x_i - k)

so it compiles to two window functions over (site ORDER BY hour) —
one running sum, one running min — a single hash-partitioned exchange
on the site key, no iteration, no state. All-integer arithmetic
(counts and an integer drift allowance k), so scores hash identically
across engines.

Gap hours count as zero — a silence anomaly is still an anomaly — via
a per-site dense hour spine (``sequence`` + explode, the same
generate_series the DuckDB twin uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cusum_scores", "cusum_anomalies"]


def cusum_scores(
    logs: DataFrame,
    k: int,
    site_col: str = "site",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-(site, hour) one-sided CUSUM score of hourly event counts.

    ``k`` is the per-hour drift allowance (counts at-or-below k/hour
    never accumulate); the returned ``cusum`` is how far the series
    has run above that allowance since the last reset. Returns
    ``(site, hour, cnt, cusum)`` over each site's dense hour range."""
    from pyspark.sql.window import Window

    hourly = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(site_col).isNotNull())
        .groupBy(
            F.col(site_col).alias("site"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = (
        hourly.groupBy("site")
        .agg(F.min("hour").alias("_lo"), F.max("hour").alias("_hi"))
        .select(
            "site",
            F.explode(
                F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    dense = spine.join(hourly, ["site", "hour"], "left").select(
        "site", "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("site").orderBy("hour")
    run = dense.withColumn(
        "_rs",
        F.sum(F.col("cnt") - F.lit(k)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return run.withColumn(
        "cusum",
        F.col("_rs")
        - F.least(
            F.lit(0).cast("long"),
            F.min("_rs").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        ),
    ).select("site", "hour", "cnt", "cusum")


def cusum_anomalies(
    logs: DataFrame,
    k: int,
    h: int,
    site_col: str = "site",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Hours where the CUSUM score exceeds the decision threshold
    ``h`` — the bounded "alerts" projection of ``cusum_scores``."""
    return cusum_scores(logs, k, site_col, ts_col).filter(
        F.col("cusum") > h
    )


def cusum_sql(
    k: int,
    h: int | None,
    logs_rel: str = "logs",
    where: str = '"timestamp" IS NOT NULL AND site IS NOT NULL',
) -> str:
    """DuckDB twin: identical dense spine + two-window closed form."""
    filt = f"WHERE cusum > {h}" if h is not None else ""
    return f"""
hourly AS (
  SELECT site, date_trunc('hour', "timestamp") AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {logs_rel} WHERE {where} GROUP BY 1, 2),
spine AS (
  SELECT site, unnest(generate_series(min(hour), max(hour),
                                      INTERVAL 1 HOUR)) AS hour
  FROM hourly GROUP BY site),
dense AS (
  SELECT s.site, s.hour, COALESCE(hh.cnt, 0) AS cnt
  FROM spine s LEFT JOIN hourly hh ON s.site = hh.site AND s.hour = hh.hour),
run AS (
  SELECT site, hour, cnt,
         sum(cnt - {k}) OVER (PARTITION BY site ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
  FROM dense),
scored AS (
  SELECT site, hour, cnt,
         CAST(rs - least(CAST(0 AS BIGINT),
              min(rs) OVER (PARTITION BY site ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS BIGINT) AS cusum
  FROM run)
SELECT site, hour, cnt, cusum FROM scored {filt}
"""
