"""Streaming KMV distinct-uniques estimation — the live twin of
``operators.kmv`` (the same bottom-k/theta sketch), so the FOLLOW
path can report per-site distinct-visitor estimates as the stream
runs, with state bounded at k BIGINT keys per site regardless of
traffic.

Spark's own streaming ``approx_count_distinct`` is per-window, not
cumulative, and ``dropDuplicates`` state grows with the TRUE distinct
count — unbounded on a 100 TB-scale stream. The KMV fold instead
carries exactly the bottom-k distinct hash keys per site in
``applyInPandasWithState``: each micro-batch unions its (deduplicated)
keys into the state, re-truncates to k, and emits the current
``(site, uniques_est, n_keys, theta)`` row — the same integer
estimator as the batch operator, so after the stream drains the final
estimate per site EQUALS the batch ``kmv_churn``-family estimate over
the same rows (pytest asserts equality).

Scale: the stateful stage shuffles two-column (site, bk) rows —
values hash to keys BEFORE the shuffle, payloads never move — and the
per-batch Python work is one numpy merge of (state ∪ batch-distinct)
followed by a k-slice.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pond_spark.streaming.conf import set_state_partitions
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pond_spark.operators.kmv import kmv_key
from pond_spark.operators.sketches import BK_MOD

__all__ = ["kmv_uniques_stream"]


def kmv_uniques_stream(
    sdf: DataFrame,
    k: int = 64,
    site_col: str = "site",
    value_col: str = "remote_host",
    seed: int = 1,
    state_partitions: int | None = None,
) -> DataFrame:
    """Per-site cumulative distinct estimate from a stream: one
    ``(site, uniques_est, n_keys, theta)`` row per site per
    micro-batch that touched it. ``uniques_est`` is the exact distinct
    count while fewer than k keys have been seen, then the KMV
    order-statistic estimate ``(k-1)*MOD div theta``. ``state_partitions`` sizes the state-store partition count for
    this stream (sets the session's shuffle partitions, captured at
    query start and pinned by the checkpoint — streaming/conf.py)."""
    set_state_partitions(sdf.sparkSession, state_partitions)
    keyed = sdf.filter(
        F.col(site_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(site_col).alias("site"),
        kmv_key(F.col(value_col), seed).alias("bk"),
    )

    out_schema = T.StructType(
        [
            T.StructField("site", T.StringType()),
            T.StructField("uniques_est", T.LongType()),
            T.StructField("n_keys", T.LongType()),
            T.StructField("theta", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("keys", T.ArrayType(T.LongType()))]
    )

    def fold(
        key: Tuple,
        frames: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        site = key[0]
        held = (
            np.asarray(state.get[0], dtype="int64")
            if state.exists
            else np.empty(0, dtype="int64")
        )
        for pdf in frames:
            if len(pdf) == 0:
                continue
            batch = pdf["bk"].to_numpy(dtype="int64")
            held = np.unique(np.concatenate([held, batch]))[:k]
        state.update((held.tolist(),))
        m = int(len(held))
        if m == 0:
            return
        if m < k:
            theta, est = BK_MOD, m
        else:
            theta = int(held[k - 1])
            est = (k - 1) * BK_MOD // theta
        yield pd.DataFrame(
            {
                "site": [site],
                "uniques_est": pd.Series([est], dtype="int64"),
                "n_keys": pd.Series([m], dtype="int64"),
                "theta": pd.Series([theta], dtype="int64"),
            }
        )

    return keyed.groupBy("site").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
