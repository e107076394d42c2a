"""Streaming time rollups — windowed aggregates with late-data
handling.

The streaming twin of ``operators.rollup.rollup_by_time``: tumbling
event-time windows per dimension, with a watermark bounding how long
the engine waits for late records — the same role as the reference's
10-second scan-past-``until`` jitter slack
(/root/reference/src/Selection.cxx:8-20): out-of-order data inside the
slack is aggregated correctly, older arrivals are dropped.

Scale notes: state per (window, dims) pair, evicted at the watermark;
append mode emits each window exactly once when it finalizes, so the
sink sees closed buckets only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_stream(
    sdf: DataFrame,
    every: str = "1 hour",
    dims: Sequence[str] = (),
    aggs: dict[str, Column] | None = None,
    ts_col: str = "timestamp",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Windowed aggregate over a streaming DataFrame.

    Returns columns ``bucket_start, bucket_end, *dims, *aggs``. Use
    ``outputMode('append')``: a bucket emits once, after the watermark
    passes its end.
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    win = F.window(F.col(ts_col), every)
    out = (
        sdf.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(win, *[F.col(d) for d in dims])
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    return out.select(
        F.col("window.start").alias("bucket_start"),
        F.col("window.end").alias("bucket_end"),
        *[F.col(d) for d in dims],
        *[F.col(name) for name in aggs],
    )
