"""Streaming CUSUM change detection — the live twin of
``operators.anomaly.cusum_scores`` (Page 1954), so the monitoring
layer runs on the FOLLOW path too: sustained per-site traffic shifts
alert from the stream, not a nightly rollup.

Batch computes the prefix-scan closed form over complete series; a
stream must instead carry the recursion's state across micro-batches,
which is three scalars per site — ``(open_hour, open_cnt, s)`` —
in ``applyInPandasWithState``:

- events land in their site's OPEN hour bucket (count only);
- when an event for a LATER hour arrives, every hour from the open
  one up to (excluding) the new one closes in order — gap hours close
  with count 0, exactly the batch operator's dense spine — and each
  close folds the textbook recursion ``s = max(0, s + cnt - k)`` and
  emits ``(site, hour, cnt, cusum)``;
- late events (hour earlier than the open hour CARRIED ACROSS
  batches) are DROPPED — the watermark trade every streaming
  aggregation makes; the batch twin re-sorts instead. WITHIN a
  micro-batch, order cannot matter: per-hour counts accumulate
  across all Arrow frames first (frames of one group arrive in no
  guaranteed order) and the fold then walks the batch's distinct
  hours sorted.

An hour therefore emits exactly once, when the stream proves it over
(first later-hour event) — identical scores to the batch closed form
over the same closed hours (pytest asserts equality; the open tail
hour is not yet emitted by the stream, by construction).

Scale: state is three scalars per site (the reference dimensions its
per-site structures for 64k sites); the stateful stage shuffles
two-column (site, hour) rows, never raw payloads, and the Python
fold is vectorized — each Arrow frame reduces to per-hour counts
with ``value_counts`` and the Python loop walks DISTINCT HOURS (a
handful per micro-batch), not events.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pond_spark.streaming.conf import set_state_partitions
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["cusum_stream"]

_HOUR_US = 3_600_000_000


def cusum_stream(
    sdf: DataFrame,
    k: int,
    h: int | None = None,
    site_col: str = "site",
    ts_col: str = "timestamp",
    state_partitions: int | None = None,
) -> DataFrame:
    """Per-(site, hour) one-sided CUSUM scores from a stream:
    ``(site, hour, cnt, cusum)`` rows for every CLOSED hour, in
    close order. ``h`` filters to alert rows (cusum > h) like
    ``cusum_anomalies``. ``state_partitions`` sizes the state-store partition count for
    this stream (sets the session's shuffle partitions, captured at
    query start and pinned by the checkpoint — streaming/conf.py)."""
    set_state_partitions(sdf.sparkSession, state_partitions)
    hourly = (
        sdf.filter(F.col(ts_col).isNotNull() & F.col(site_col).isNotNull())
        .select(
            F.col(site_col).alias("site"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
    )

    out_schema = T.StructType(
        [
            T.StructField("site", T.StringType()),
            T.StructField("hour", T.TimestampType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("cusum", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("open_us", T.LongType()),  # -1 = no hour yet
            T.StructField("open_cnt", T.LongType()),
            T.StructField("s", T.LongType()),
        ]
    )

    def fold(
        key: Tuple,
        frames: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        site = key[0]
        if state.exists:
            open_us, open_cnt, s = state.get
        else:
            open_us, open_cnt, s = -1, 0, 0
        out_hours: list[int] = []
        out_cnts: list[int] = []
        out_scores: list[int] = []

        def close_through(new_us: int) -> None:
            """Close the open hour and any gap hours before new_us."""
            nonlocal open_us, open_cnt, s
            while open_us < new_us:
                cnt = open_cnt
                s = max(0, s + cnt - k)
                out_hours.append(open_us)
                out_cnts.append(cnt)
                out_scores.append(s)
                open_us += _HOUR_US
                open_cnt = 0  # gap hours count zero (dense spine)

        # accumulate per-hour counts across ALL frames BEFORE folding:
        # Arrow splits a large group into multiple frames with no
        # ordering guarantee between them, so walking hours as frames
        # arrive would mis-drop an earlier hour delivered in a later
        # frame as "late". Only hours late relative to the CROSS-BATCH
        # state (the open hour carried in) are dropped.
        batch_counts: dict[int, int] = {}
        for pdf in frames:
            if len(pdf) == 0:
                continue
            for ts, n in pdf["hour"].value_counts().items():
                us = int(ts.value // 1000)
                batch_counts[us] = batch_counts.get(us, 0) + int(n)
        for us in sorted(batch_counts):
            if open_us < 0:
                open_us = us
            if us < open_us:
                continue  # late vs carried state: dropped (watermark trade)
            if us > open_us:
                close_through(us)
            open_cnt += batch_counts[us]
        state.update((int(open_us), int(open_cnt), int(s)))
        if out_hours:
            yield pd.DataFrame(
                {
                    "site": site,
                    "hour": pd.to_datetime(
                        pd.Series(out_hours, dtype="int64"), unit="us"
                    ),
                    "cnt": pd.Series(out_cnts, dtype="int64"),
                    "cusum": pd.Series(out_scores, dtype="int64"),
                }
            )

    scored = hourly.groupBy("site").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return scored.filter(F.col("cusum") > h) if h is not None else scored
