"""Client-side aggregation operators (SURVEY.md §2.4).

The reference accumulates in the CLI client after the server streamed
matching records (/root/reference/src/client/ResultWriter.cxx:213-244);
here they are just more DataFrame stages, so the aggregation runs
distributed with map-side partial aggregation and only the tiny result
is collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def accumulate_top(df: DataFrame, field: str, n: int) -> DataFrame:
    """``--accumulate=FIELD,top,N`` (A1): group-count on the field
    (records with NULL field dropped — the reference skips records
    missing the attribute, ResultWriter.cxx:217-230), then top-N by
    count.

    The reference uses a size-N min-heap
    (/root/reference/src/client/ResultWriter.cxx:400-429); Spark
    compiles ``orderBy(desc).limit(n)`` to TakeOrderedAndProject — the
    same O(rows · log N) profile, but distributed (per-partition heaps
    merged on the driver, no global sort). The heap's tie order is
    unspecified in the reference; we tie-break by value ascending for
    determinism.

    Returns columns ``(count, value)``.
    """
    return (
        df.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("value").asc())
        .limit(n)
        .select("count", "value")
    )


def accumulate_more(df: DataFrame, field: str, n: int) -> DataFrame:
    """``--accumulate=FIELD,more,N`` (A2): group-count, keep groups with
    count >= N (/root/reference/src/client/ResultWriter.cxx:431-439).
    The reference prints in hash-map iteration order (unordered); the
    result here is a set — callers needing an order must sort.
    """
    return (
        df.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= n)
        .select("count", "value")
    )


def age_only(df: DataFrame, now: Column, ts_col: str = "timestamp") -> DataFrame:
    """``--age-only`` (A3): project each record to ``now - timestamp``
    in whole seconds (/root/reference/src/client/ResultWriter.cxx:
    198-211). ``now`` is an explicit Column (pass
    ``F.current_timestamp()`` interactively; tests pass a literal for
    determinism). Records without a timestamp are skipped (the
    reference returns early when !HasTimestamp)."""
    ts = F.col(ts_col)
    return df.filter(ts.isNotNull()).select(
        (now.cast("long") - ts.cast("long")).alias("age_s")
    )
