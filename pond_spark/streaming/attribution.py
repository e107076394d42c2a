"""Streaming attribution — a watermarked stream-stream join: attribute
each conversion event to the user's preceding trigger event within a
horizon, live. The streaming sibling of the batch funnel
(operators/funnel.py): the funnel reports aggregate conversion after
the fact; this emits (trigger, conversion) pairs as they happen.

Structured Streaming semantics used here (the canonical interval-join
recipe): both sides carry watermarks, and the join condition bounds
the event-time distance — that bound is what lets the engine evict
buffered state (a stream-stream join without it would buffer both
streams forever). State per side is bounded by
``watermark + horizon`` of history per user.

At scale the join shuffles both streams on the user key once;
everything else is per-row. Late events beyond the watermark drop —
the same role as the reference's 10-second jitter slack
(/root/reference/src/Selection.cxx:8-20).

Latency note: this INNER join emits matched pairs as they arrive, but
any STATEFUL operator a consumer chains downstream (windowed
aggregation, dedup) inherits an output watermark held back by the
horizon — the join retains state that long, so downstream windows
close only once the watermark passes ``window_end + horizon``
(measured and documented in streaming/asof.py, whose second stage hits
exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_conversions(
    triggers: DataFrame,
    conversions: DataFrame,
    horizon_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Pairs ``(user_id, trigger_id, trigger_ts, conversion_id,
    conversion_ts)`` where the conversion happened strictly after the
    trigger and within ``horizon_seconds`` of it. Every qualifying
    (trigger, conversion) pair emits — downstream pick first-touch/
    last-touch by aggregating on conversion_id (batch or
    foreachBatch; streaming can't rank its own join output)."""
    t = (
        triggers.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).alias("_tu"),
            F.col(id_col).alias("trigger_id"),
            F.col(ts_col).alias("trigger_ts"),
        )
    )
    c = (
        conversions.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).alias("_cu"),
            F.col(id_col).alias("conversion_id"),
            F.col(ts_col).alias("conversion_ts"),
        )
    )
    cond = (
        (F.col("_tu") == F.col("_cu"))
        & (F.col("conversion_ts") > F.col("trigger_ts"))
        & (
            F.col("conversion_ts")
            <= F.col("trigger_ts")
            + F.expr(f"INTERVAL {int(horizon_seconds)} SECOND")
        )
    )
    return t.join(c, cond, "inner").select(
        F.col("_tu").alias(user_col),
        "trigger_id",
        "trigger_ts",
        "conversion_id",
        "conversion_ts",
    )
