"""FUSED streaming as-of join — one transformWithState operator
instead of the two chained stateful operators in streaming/asof.py
(round-10 #8, the measured close-lag floor).

Why this exists: the chained twin's delivery floor is NOT IO —
tools/asof_lag_probe.py measured 4% listing vs 65-75% state-commit
across ~6 watermark-propagation triggers, because each chained
stateful operator emits one watermark step behind the one before it
BY CONSTRUCTION (join releases a left row only at
``watermark >= ts + horizon`` — its output watermark is held back by
the join bound — and the downstream window then needs the DELAYED
watermark to pass its window end). Fusing join+reduce into one
arbitrary-state operator needs exactly ONE watermark condition: a
left row is final as soon as ``watermark >= left.ts`` (no right row
at or before ``left.ts`` can still arrive), so delivery takes ~2
trigger roundtrips instead of ~6 and skips the horizon wait entirely.

The trade, stated honestly: transformWithStateInPandas puts PYTHON in
the per-trigger path (Arrow batches into a StatefulProcessor), where
the chained twin is all-JVM. This module is therefore the LATENCY
variant: pick it when close-lag matters more than per-row throughput;
keep ``asof_join_stream`` when the stream is wide and the horizon wait
is acceptable. Semantics are the batch twin's (same as the chained
twin): latest right at-or-before each left row within the horizon,
ties at equal right ts resolve to the greatest payload tuple, NULLs
sort smallest, NULL-key rows group together (groupBy parity with
eqNullSafe), a NULL-ts left row never emits (no event time = no close
signal — the chained twin's documented divergence, shared).

State per key, bounded: pending left rows until ``watermark >= ts``
(each held ~watermark-delay of event time, far less than the chained
twin's horizon+window retention), and right rows pruned to
``ts > watermark - horizon`` (exactly the lookback future lefts can
still need). One event-time timer per key (the earliest pending left)
guarantees closure when a key receives no further input.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

from pond_spark.streaming.conf import set_state_partitions

__all__ = ["asof_join_stream_fused", "tws_available"]


def tws_available() -> bool:
    """transformWithStateInPandas needs ``google.protobuf`` at RUNTIME
    (the Python worker speaks the state-server protocol via
    StateMessage_pb2 — pyspark/sql/streaming/proto/StateMessage_pb2.py
    imports google.protobuf.descriptor at query start, after planning
    succeeds). The API surface itself ships with PySpark 4.1.2, so
    import and plan-build both work in a protobuf-less container and
    the query then dies with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — this probe makes
    the gap a loud precondition instead of a mid-query crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _zero_lit(dt) -> "Column | None":
    """A typed zero literal for coalescing nulls out of a value column
    before the Arrow hop (see _AsofProcessor's null-transport note).
    None for types with no cheap zero — those keep their nulls and ride
    as pandas object columns, which are already lossless."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        NumericType,
        StringType,
        TimestampType,
    )

    if isinstance(dt, BooleanType):
        return F.lit(False)
    if isinstance(dt, NumericType):
        return F.lit(0).cast(dt)
    if isinstance(dt, StringType):
        return F.lit("")
    if isinstance(dt, TimestampType):
        return F.timestamp_seconds(F.lit(0))
    if isinstance(dt, DateType):
        return F.date_from_unix_date(F.lit(0))
    return None


def _rank_key(vals: tuple) -> tuple:
    """Total order for payload tie-breaks matching the batch twin's
    max(struct(...)): NULL sorts smallest, else natural order —
    (present, value) pairs keep mixed None/value comparable."""
    return tuple((v is not None, v) for v in vals)


class _AsofProcessor(StatefulProcessor):
    """Per-key state: ``lefts`` (pending rows as (ts_us, *left_vals)),
    ``rights`` ((ts_us, *payload_vals)). Flush on every input batch
    and on timer expiry; prune rights behind the horizon after each
    flush.

    Null transport (ADVICE r10): the unified stream carries every
    value column COALESCED to a typed zero plus an explicit boolean
    mask column (``c IS NULL``, computed Spark-side where null and NaN
    are still distinct). The pandas batch therefore never sees a null
    in a value column — long columns stay int64 (no float64 upcast,
    no silent precision loss past 2^53 on the way into LongType
    state), float columns keep GENUINE NaN payloads (the old
    ``v != v -> None`` sentinel erased them), and a genuine null is
    recovered exactly from its mask bit. Row layout:
    keys, left_vals, payload, left_masks, payload_masks, _ets, _side.
    """

    def __init__(self, left_state_schema, right_state_schema,
                 horizon_us: int, n_key: int, n_left: int,
                 n_pay: int, out_cols: list[str]):
        self._lschema = left_state_schema
        self._rschema = right_state_schema
        self._horizon_us = horizon_us
        self._n_key = n_key
        self._n_left = n_left
        self._n_pay = n_pay
        self._out_cols = out_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._lefts = handle.getListState("lefts", self._lschema)
        self._rights = handle.getListState("rights", self._rschema)
        self._handle = handle

    def _flush(self, key: tuple, wm_us: int) -> Iterator:
        import pandas as pd

        lefts = list(self._lefts.get())
        rights = list(self._rights.get())
        if not lefts and not rights:
            return
        # STRICTLY past the watermark (ADVICE r10): a right row with
        # event time EQUAL to the watermark is still on-time and can
        # arrive in a later trigger; the match bound is inclusive
        # (right.ts <= left.ts), so a left closes only at wm > ts
        emit = [lv for lv in lefts if lv[0] < wm_us]
        hold = [lv for lv in lefts if lv[0] >= wm_us]
        out_rows = []
        for lv in emit:
            ts_us = lv[0]
            best = None
            for rv in rights:
                if ts_us - self._horizon_us < rv[0] <= ts_us:
                    if best is None or (rv[0], _rank_key(rv[1:])) > (
                        best[0], _rank_key(best[1:])
                    ):
                        best = rv
            payload = best[1:] if best is not None else (None,) * (
                len(self._rschema.fields) - 1
            )
            out_rows.append(tuple(key) + tuple(lv[1:]) + tuple(payload))
        # rights a future left (ts > wm) can still reach: ts > wm - horizon
        keep_rights = [rv for rv in rights if rv[0] > wm_us - self._horizon_us]
        if hold:
            self._lefts.put(hold)
            # one timer just past the earliest pending close point
            # (ceil to the next ms so the ms-grain timer can't fire a
            # flush whose us-grain watermark still holds the row);
            # stale earlier timers just trigger a no-op flush
            self._handle.registerTimer(min(lv[0] for lv in hold) // 1000 + 1)
        else:
            self._lefts.clear()
        if keep_rights:
            self._rights.put(keep_rights)
        else:
            self._rights.clear()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=self._out_cols)

    def handleInputRows(self, key, rows, timerValues) -> Iterator:
        new_lefts: list[tuple] = []
        new_rights: list[tuple] = []
        n_lv = self._n_left - self._n_key
        lm_off = self._n_left + self._n_pay       # left masks start
        rm_off = lm_off + n_lv                    # payload masks start
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                side = row[-1]
                ts = row[-2]
                if ts != ts or ts is None:  # NaT: no event time, no close
                    continue
                ts_us = int(ts.value // 1000)  # pandas ns -> micros
                if side == 0:
                    new_lefts.append((ts_us,) + tuple(
                        None if row[lm_off + i] else v
                        for i, v in enumerate(
                            row[self._n_key: self._n_left]
                        )
                    ))
                else:
                    new_rights.append((ts_us,) + tuple(
                        None if row[rm_off + i] else v
                        for i, v in enumerate(
                            row[self._n_left: self._n_left + self._n_pay]
                        )
                    ))
        if new_lefts:
            self._lefts.appendList(new_lefts)
        if new_rights:
            self._rights.appendList(new_rights)
        yield from self._flush(key, timerValues.getCurrentWatermarkInMs() * 1000)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator:
        yield from self._flush(key, timerValues.getCurrentWatermarkInMs() * 1000)

    def close(self) -> None:
        pass


def asof_join_stream_fused(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    horizon_seconds: int,
    ts_col: str = "timestamp",
    right_ts_col: str | None = None,
    watermark: str = "10 seconds",
    state_partitions: int | None = None,
) -> DataFrame:
    """Append-mode stream with the same output contract as
    ``asof_join_stream`` (left row + ``asof_``-collision-renamed right
    payload), minus the ``emit_window`` dial — the fused operator
    emits each left row the moment the watermark passes its timestamp.

    Output column order: key cols, left non-key cols, right payload
    cols. Left rows surface as soon as ``watermark >= left.ts`` —
    latency ~watermark delay + 2 trigger roundtrips, measured against
    the chained twin by tools/asof_lag_probe.py --fused."""
    if not tws_available():
        raise NotImplementedError(
            "asof_join_stream_fused needs transformWithStateInPandas's "
            "runtime dependency google.protobuf, which this environment "
            "lacks (see tws_available) — use the all-JVM chained twin "
            "asof_join_stream, whose measured close-lag floor is the "
            "documented trade (PERF_NOTES r9/r10)"
        )
    if not key_cols:
        raise ValueError(
            "asof_join_stream_fused needs at least one key column — a "
            "global stream-stream as-of cannot bound or distribute its "
            "state"
        )
    rts = right_ts_col or ts_col
    key_cols = list(key_cols)
    left_vals = [c for c in left.columns if c not in key_cols]
    payload_src = [c for c in right.columns if c not in key_cols and c != rts]
    if not payload_src:
        raise ValueError("right side has no payload columns")
    taken = set(key_cols) | set(left_vals)
    payload_out = [
        (c, f"asof_{c}" if c in taken else c) for c in payload_src
    ]

    # unified tagged stream (ADVICE r10 null transport): every value
    # column travels coalesced to a typed zero next to an explicit
    # boolean null-mask, so the Arrow batch never carries a null in a
    # value column — int64 columns stay int64 across the union (the
    # old NULL padding upcast them to float64 per batch, silently
    # losing precision past 2^53 into LongType state) and genuine NaN
    # float payloads survive (the old NaN sentinel erased them).
    # Layout: keys, left_vals, payload, left masks, payload masks,
    # (_ets, _side).
    lv_type = {c: left.schema[c].dataType for c in left_vals}
    pay_type = {c: right.schema[c].dataType for c in payload_src}

    def _present(name: str, dt) -> Column:
        z = _zero_lit(dt)
        return F.coalesce(F.col(name), z) if z is not None else F.col(name)

    def _padding(dt) -> Column:
        z = _zero_lit(dt)
        return z if z is not None else F.lit(None).cast(dt)

    lhs = left.withWatermark(ts_col, watermark).select(
        *[F.col(c) for c in key_cols],
        *[_present(c, lv_type[c]).alias(c) for c in left_vals],
        *[_padding(pay_type[c]).alias(f"_r_{c}") for c in payload_src],
        *[F.col(c).isNull().alias(f"_ml_{c}") for c in left_vals],
        *[F.lit(True).alias(f"_mr_{c}") for c in payload_src],
        F.col(ts_col).alias("_ets"),
        F.lit(0).alias("_side"),
    )
    rhs = right.withWatermark(rts, watermark).select(
        *[F.col(c) for c in key_cols],
        *[_padding(lv_type[c]).alias(c) for c in left_vals],
        *[_present(c, pay_type[c]).alias(f"_r_{c}") for c in payload_src],
        *[F.lit(True).alias(f"_ml_{c}") for c in left_vals],
        *[F.col(c).isNull().alias(f"_mr_{c}") for c in payload_src],
        F.col(rts).alias("_ets"),
        F.lit(1).alias("_side"),
    )
    unified = lhs.unionByName(rhs)

    # state schemas: ts_us + the natural column types (nullable — the
    # masks recover genuine nulls, which DO land in state)
    lf = [StructField("ts_us", LongType())] + [
        StructField(c, lv_type[c]) for c in left_vals
    ]
    rf = [StructField("ts_us", LongType())] + [
        StructField(c, pay_type[c]) for c in payload_src
    ]
    out_fields = (
        [left.schema[c] for c in key_cols]
        + [left.schema[c] for c in left_vals]
        + [StructField(o, right.schema[c].dataType) for c, o in payload_out]
    )
    proc = _AsofProcessor(
        StructType(lf), StructType(rf),
        horizon_us=int(horizon_seconds) * 1_000_000,
        n_key=len(key_cols),
        n_left=len(key_cols) + len(left_vals),
        n_pay=len(payload_src),
        out_cols=[f.name for f in out_fields],
    )
    if state_partitions is not None:
        set_state_partitions(unified.sparkSession, state_partitions)
    return unified.groupBy(*key_cols).transformWithStateInPandas(
        proc,
        outputStructType=StructType(out_fields),
        outputMode="Append",
        timeMode="EventTime",
    )
