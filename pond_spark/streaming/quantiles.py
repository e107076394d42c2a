"""Streaming value quantiles — the live twin of the persisted
bottom-k VALUE sketch (operators/sketches.py build/update_value_
sketches + value_quantiles_over_range), completing the monitoring
symmetry the KMV/CUSUM twins set: per-site latency/size percentiles
on the FOLLOW path, with state bounded at k rows per site.

Spark's streaming ``percentile_approx`` needs windowed aggregation
(per-window, not cumulative) and its sketch is not deterministic
across engines. The bottom-k sample IS: membership is a pure function
of ``(id, seed)`` — ``bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪
bottom_k(B))`` — so the stream carries exactly the k sample rows
``(bk, rid, value)`` per site in ``applyInPandasWithState``, merges
each micro-batch's candidate rows, re-truncates to k, and emits the
site's refreshed ``(n_sample, q50, q90, ...)`` row with EXACT-RANK
selection (position ``ceil(q·m)`` of the sample ordered by
``(value, rid)``) — the identical estimator as the batch serve path,
so after the stream drains the final per-site row EQUALS
``value_quantiles_over_range`` on the same rows (pytest asserts it).

Re-delivered rows dedupe on ``(bk, rid)`` (sample membership is
id-determined), so at-least-once sources do not skew the sample.

Scale: the stateful stage shuffles ``(site, bk, rid, value)`` rows
only; per-batch Python work is one pandas concat + lexsort + k-slice
per touched site. Emitted quantile values are untouched input doubles
(PERF_NOTES rule: pass-through floats hash safely; computed ones
do not).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pond_spark.streaming.conf import set_state_partitions
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pond_spark.operators.sketches import _bk_key, quantile_col_names

__all__ = ["value_quantiles_stream"]


def value_quantiles_stream(
    sdf: DataFrame,
    k: int = 64,
    quantiles: Sequence[float] = (0.5, 0.9),
    site_col: str = "site",
    value_col: str = "value",
    id_col: str = "id",
    seed: int = 1,
    state_partitions: int | None = None,
) -> DataFrame:
    """Per-site cumulative quantile estimates from a stream: one
    ``(site, n_sample, q50, q90, ...)`` row per site per micro-batch
    that touched it. Exact over a site until k rows have been sampled,
    then the bottom-k uniform-sample estimate (rank error
    ~O(1/sqrt(k))). ``state_partitions`` sizes the state-store partition count for
    this stream (sets the session's shuffle partitions, captured at
    query start and pinned by the checkpoint — streaming/conf.py)."""
    set_state_partitions(sdf.sparkSession, state_partitions)
    qs = list(quantiles)
    # shared with the batch serve so both surfaces name columns
    # identically; raises on (0.999, 1.0)-style collisions (ADVICE r7)
    qnames = quantile_col_names(qs)
    keyed = sdf.filter(
        F.col(site_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(site_col).alias("site"),
        _bk_key(id_col, seed).alias("bk"),
        F.col(id_col).alias("rid"),
        F.col(value_col).cast("double").alias("value"),
    )

    out_schema = T.StructType(
        [
            T.StructField("site", T.StringType()),
            T.StructField("n_sample", T.LongType()),
        ]
        + [T.StructField(n, T.DoubleType()) for n in qnames]
    )
    state_schema = T.StructType(
        [
            T.StructField("bk", T.ArrayType(T.LongType())),
            T.StructField("rid", T.ArrayType(T.LongType())),
            T.StructField("value", T.ArrayType(T.DoubleType())),
        ]
    )

    def fold(
        key: Tuple,
        frames: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        site = key[0]
        if state.exists:
            bk, rid, val = (list(a) for a in state.get)
        else:
            bk, rid, val = [], [], []
        parts = [p for p in frames if len(p)]
        if not parts:
            state.update((bk, rid, val))
            return
        batch = pd.concat(parts, ignore_index=True)
        cur = pd.DataFrame(
            {
                "bk": bk + batch["bk"].astype("int64").tolist(),
                "rid": rid + batch["rid"].astype("int64").tolist(),
                "value": val + batch["value"].astype("float64").tolist(),
            }
        )
        # merge identity: dedupe (re-deliveries), order by (bk, rid),
        # keep the k smallest — exactly the batch serve path's window
        cur = (
            cur.drop_duplicates(["bk", "rid"])
            .sort_values(["bk", "rid"], kind="mergesort")
            .head(k)
        )
        state.update(
            (
                [int(x) for x in cur["bk"]],
                [int(x) for x in cur["rid"]],
                [float(x) for x in cur["value"]],
            )
        )
        ranked = cur.sort_values(["value", "rid"], kind="mergesort")
        m = len(ranked)
        row = {"site": [site], "n_sample": [m]}
        import math

        for q, name in zip(qs, qnames):
            pos = max(1, math.ceil(q * m))
            row[name] = [float(ranked["value"].iloc[pos - 1])]
        yield pd.DataFrame(row)

    return keyed.groupBy("site").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
