"""Streaming per-site top-k — pond's GROUP_SITE (Q5) meets the
accumulate top,N operator (A1), live.

Two shapes, matching how the batch engine splits the same question:

1. **Windowed** (:func:`site_key_counts_stream` +
   :func:`top_keys_per_site`): per tumbling event-time window, count
   (site, key) occurrences with watermark-bounded state, append-mode
   finalized windows, and a deterministic batch top-k finisher — the
   exact pattern streaming/trending.py uses corpus-wide, here scoped
   per site the way GROUP_SITE scopes every result
   (/root/reference/src/Selection.cxx GROUP_SITE semantics; the
   finisher mirrors operators/accumulate.py top,N ordering: count
   desc, key asc).

2. **Continuous bounded-state heavy hitters**
   (:func:`group_site_topk_stream`): cumulative per-site top-k over
   the whole stream via the Space-Saving sketch (Metwally, Agrawal &
   El Abbadi, "Efficient computation of frequent and top-k elements
   in data streams", ICDT 2005): per site, at most ``m`` counters
   (key, count, err); an unseen key evicts the minimum counter and
   inherits its count as error bound. State is O(m) per site NO
   MATTER the key cardinality — the property that makes a per-site
   top-URL dashboard safe against a 100 TB stream of unbounded
   distinct URIs, where exact per-key state would grow without bound.
   Emits the current top-k per site each micro-batch (update-style
   output through the append-mode operator: every batch appends that
   batch's refreshed ranking, stamped with the batch watermark).

Guarantee (Metwally §4): every key with true count > count_min (the
smallest tracked counter) IS in the sketch, and tracked counts
overestimate by at most ``err``. With m >= ~5x k the top-k of a
zipf-ish stream is exact in practice; the emitted ``err`` column lets
the consumer see the uncertainty.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window


def site_key_counts_stream(
    sdf: DataFrame,
    key_col: str = "uri",
    site_col: str = "site",
    ts_col: str = "timestamp",
    every: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Windowed per-site key counts:
    ``(bucket_start, bucket_end, site, key, n)``. Append mode — each
    window finalizes once its end passes the watermark. The empty-site
    rule (F1: NULL site → "") applies before grouping, matching the
    batch GROUP_SITE surface."""
    win = F.window(F.col(ts_col), every)
    # NULL keys drop, matching the batch accumulate surface (records
    # missing the attribute are skipped, ResultWriter.cxx:217-230) —
    # only the SITE gets the F1 NULL→"" mapping, never the key (r7
    # review: counting NULL keys as "" surfaced a bogus top entry the
    # batch engine would never show)
    return (
        sdf.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.coalesce(F.col(site_col), F.lit("")).alias("site"),
            F.col(key_col).alias("key"),
        )
        .groupBy(win, "site", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("bucket_start"),
            F.col("window.end").alias("bucket_end"),
            "site",
            "key",
            "n",
        )
    )


def top_keys_per_site(counts: DataFrame, k: int = 10) -> DataFrame:
    """Batch finisher over the append-mode sink: per (bucket, site)
    top-k by (n desc, key asc) — the accumulate top,N ordering."""
    w = Window.partitionBy("bucket_start", "site").orderBy(
        F.col("n").desc(), F.col("key").asc()
    )
    return counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def group_site_topk_stream(
    sdf: DataFrame,
    key_col: str = "uri",
    site_col: str = "site",
    k: int = 10,
    m: int = 64,
) -> DataFrame:
    """Continuous per-site top-k with Space-Saving bounded state:
    ``(site, key, n, err, rank, batch_id)``.

    Each micro-batch updates the per-site sketch (<= ``m`` counters)
    and appends that site's refreshed top-``k``; ``batch_id`` is a
    per-site batch sequence number so a consumer reads the latest
    ranking as ``max(batch_id)`` per site. ``err`` is the Space-Saving
    overestimation bound for the row (0 = exact)."""
    if m < k:
        raise ValueError(f"m ({m}) must be >= k ({k})")

    out_schema = T.StructType(
        [
            T.StructField("site", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("batch_id", T.LongType()),
        ]
    )
    # state: parallel arrays (keys, counts, errs) + batch counter —
    # flat arrays keep the checkpoint Arrow-friendly
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("errs", T.ArrayType(T.LongType())),
            T.StructField("batch", T.LongType()),
        ]
    )

    def update(
        key: Tuple,
        frames: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        site = key[0]
        if state.exists:
            keys, counts, errs, batch = state.get
            sketch = {
                kk: [cc, ee] for kk, cc, ee in zip(keys, counts, errs)
            }
        else:
            sketch, batch = {}, 0
        for pdf in frames:
            for kk in pdf["key"]:
                kk = str(kk)  # NULL keys filtered in the plan below
                if kk in sketch:
                    sketch[kk][0] += 1
                elif len(sketch) < m:
                    sketch[kk] = [1, 0]
                else:
                    # evict the min counter (ties: lexicographic key,
                    # deterministic across reruns); the newcomer
                    # inherits its count as the error bound
                    mn_k = min(sketch, key=lambda x: (sketch[x][0], x))
                    mn_c = sketch[mn_k][0]
                    del sketch[mn_k]
                    sketch[kk] = [mn_c + 1, mn_c]
        batch += 1
        top = sorted(sketch.items(), key=lambda it: (-it[1][0], it[0]))[:k]
        yield pd.DataFrame(
            {
                "site": [site] * len(top),
                "key": [t[0] for t in top],
                "n": [t[1][0] for t in top],
                "err": [t[1][1] for t in top],
                "rank": list(range(1, len(top) + 1)),
                "batch_id": [batch] * len(top),
            }
        )
        items = sorted(sketch.items())
        state.update(
            (
                [t[0] for t in items],
                [t[1][0] for t in items],
                [t[1][1] for t in items],
                int(batch),
            )
        )

    # NULL keys drop (batch accumulate parity, see
    # site_key_counts_stream); NULL site maps to "" (F1)
    keyed = sdf.filter(F.col(key_col).isNotNull()).select(
        F.coalesce(F.col(site_col), F.lit("")).alias("site"),
        F.col(key_col).cast("string").alias("key"),
    )
    return keyed.groupBy("site").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
