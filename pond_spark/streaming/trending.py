"""Streaming trending terms — windowed word counts with late-data
handling, plus a per-window top-k finisher.

The streaming analog of the batch vocabulary/TF-IDF profile
(functions/tfidf.py, q:vocab_stats): what is being said NOW, per
tumbling event-time window — the standard live-dashboard aggregate
over a document/message stream.

Late data: the watermark bounds how long a window waits, the same role
as the reference's 10-second scan-past-``until`` jitter slack
(/root/reference/src/Selection.cxx:8-20).

Ranking note: Spark does not allow rank/row_number over a streaming
aggregate, so the per-window top-k is a FINISHER applied either to the
append-mode output (each window emits exactly once, finalized, so a
downstream batch rank over the sink is exact) or inside foreachBatch —
the same split as pipeline.curate_foreach_batch uses for corpus-level
stages. State per (window, word) pair, evicted at the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pond_spark.functions.text import _words


def trending_terms_stream(
    sdf: DataFrame,
    text_col: str = "text",
    ts_col: str = "timestamp",
    every: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Windowed word counts over a streaming DataFrame:
    ``(bucket_start, bucket_end, word, n)``. Use append mode — each
    window emits once, after the watermark passes its end."""
    win = F.window(F.col(ts_col), every)
    words = (
        sdf.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(_words(F.col(text_col))).alias("word"))
    )
    return (
        words.groupBy(win, "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("bucket_start"),
            F.col("window.end").alias("bucket_end"),
            "word",
            "n",
        )
    )


def top_terms_per_bucket(counts: DataFrame, k: int = 10) -> DataFrame:
    """Batch finisher: per-bucket top-k by (n desc, word asc) —
    deterministic ties. Apply to the append-mode sink (finalized
    windows) or inside foreachBatch."""
    w = Window.partitionBy("bucket_start").orderBy(
        F.col("n").desc(), F.col("word").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
