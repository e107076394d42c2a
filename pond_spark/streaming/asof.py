"""Streaming as-of join — the live twin of ``operators.asof.asof_join``
(VERDICT r6 ask #8): attach the latest right row at or before each
left row's timestamp, per key, from two live streams.

A true unbounded as-of cannot stream — "the latest right row so far"
is only final once no earlier-stamped right row can still arrive, and
unbounded lookback means unbounded buffered state. The streaming twin
therefore takes the same trade every stream-stream join takes
(streaming/attribution.py): matches are bounded to a HORIZON —
``right.ts in (left.ts - horizon, left.ts]`` — which is exactly what
lets the engine evict state (``watermark + horizon`` of history per
key, the bound VERDICT r6 asked for).

Spark-first composition, no Python in the path — two chained stateful
operators (supported since Spark 3.5, SPARK-42376):

1. watermarked LEFT-OUTER time-interval join: every candidate right
   row within the horizon pairs up; a left row with no candidate
   emits NULL-padded once the watermark proves no match can arrive;
2. windowed aggregation ``max(struct(right_ts, payload...))`` grouped
   by ``(window(left_ts), left row)`` — the SAME single-struct carry
   as the batch twin, so the emitted payload always comes from ONE
   right row, ties at equal right ts resolve to the greatest payload
   tuple (batch parity), and the all-NULL struct of an unmatched row
   loses to any real match (NULL sorts smallest).

The window is an EMISSION cadence, not a semantic bucket: rows group
by the left row's full identity; the window only gives the
aggregation a watermark-driven close. Output latency is up to
``horizon + emit_window + watermark`` behind the stream's event time:
the left-OUTER join holds its output watermark back by the join's
time bound (state retention — Spark's multi-stateful-operator rule),
so the downstream window closes only once the input watermark passes
``window_end + horizon``. Size the horizon to the real lookback you
need — it is a LATENCY dial as much as a state-size dial (measured:
with horizon=2h, results finalize 2h of event time behind the tail;
bench's stream_asof_close_lag drives this end to end).

Two implementation notes that cost a debugging session each:

- a stateful aggregation admits at most ONE event-time column, and
  ``window()`` claims it — so the left timestamp enters the group key
  as ``unix_micros`` (a plain long, losslessly re-derived in the
  output projection) instead of its watermarked self;
- when validating streaming output by console, strip carriage
  returns first: the stage-progress meter overwrites the first
  printed row and fabricates a phantom "dropped row" (we chased this
  as a chained-stateful watermark race for an afternoon; per-batch
  ``numRowsDroppedByWatermark`` said 0 because nothing was dropped).

Scale: both streams shuffle once on the join key; join state is
bounded by watermark + horizon per side, aggregation state is one
struct per in-flight left row. Everything runs in the JVM — the
Python layer only declares the plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pond_spark.streaming.conf import set_state_partitions

__all__ = ["asof_join_stream"]


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    horizon_seconds: int,
    ts_col: str = "timestamp",
    right_ts_col: str | None = None,
    watermark: str = "10 seconds",
    emit_window: str = "1 minute",
    state_partitions: int | None = None,
) -> DataFrame:
    """Append-mode stream: every left row + the payload columns of the
    latest right row with ``left.ts - horizon < right.ts <= left.ts``
    (NULLs when none within the horizon).

    Right payload = every right column except the keys and timestamp,
    emitted under the batch twin's naming rule (``asof_<name>`` on
    collision with a left column). Both inputs must be streaming
    DataFrames with event-time ``ts_col`` (``right_ts_col`` if the
    right side names it differently); watermarks are applied here —
    pass raw streams, not pre-watermarked ones.

    Known divergences from the batch twin, both inherent to
    append-mode streaming: (1) EXACT-duplicate left rows landing in
    the same emit window collapse to one output row (the batch window
    emits one row per input row) — give left rows a unique id column
    when duplicate rows must survive; (2) a left row with a NULL
    timestamp never emits (no event time = no close signal), where
    the batch twin emits it with NULL payload.

    NULL keys are NOT a divergence: the join keys compare with
    ``eqNullSafe``, matching the batch twin's ``Window.partitionBy``
    which groups NULL keys together (ADVICE r7).

    ``state_partitions`` sizes the state-store partition count for
    this stream (sets the session's shuffle partitions, captured at
    query start and pinned by the checkpoint — streaming/conf.py).
    """
    if not key_cols:
        raise ValueError(
            "asof_join_stream needs at least one key column — a global "
            "stream-stream as-of cannot bound or distribute its state"
        )
    if int(horizon_seconds) <= 0:
        raise ValueError(
            "asof_join_stream needs a positive horizon — zero matches "
            "nothing (the bound is right.ts > left.ts - horizon) and "
            "the horizon is what lets join state evict"
        )
    set_state_partitions(left.sparkSession, state_partitions)
    right_ts_col = right_ts_col or ts_col
    payload = [
        c for c in right.columns if c not in (*key_cols, right_ts_col)
    ]
    if not payload:
        # a payload-less as-of attaches nothing — and worse than
        # useless here: with no output column referencing the right
        # side, Catalyst eliminates the outer join AND the right
        # source, while the right's watermark node keeps pinning the
        # global watermark at epoch, so the stream silently never
        # emits (measured). Refuse loudly instead.
        raise ValueError(
            "asof_join_stream: the right side has no payload columns "
            "(only keys and the timestamp) — an as-of join that "
            "attaches nothing is a no-op; select at least one payload "
            "column"
        )
    lcols = left.columns
    for c in ("_rts", "_win", "_lts"):
        if c in lcols or c in right.columns:
            raise ValueError(f"column {c!r} is reserved by asof_join_stream")

    def out_name(c: str) -> str:
        if c not in lcols:
            return c
        renamed = f"asof_{c}"
        if renamed in lcols or renamed in payload:
            raise ValueError(
                f"asof_join_stream: right payload column {c!r} collides "
                f"with a left column and the fallback name {renamed!r} is "
                "also taken — rename one side"
            )
        return renamed

    # internal payload slots are positional so a left column sharing a
    # payload name can never leak into the carry (batch-twin rule)
    slots = {c: f"_p{i}" for i, c in enumerate(payload)}
    keys = [f"_k{i}" for i in range(len(key_cols))]

    l_wm = left.withWatermark(ts_col, watermark)
    # a right row without a timestamp can never be "the latest at or
    # before" anything (batch-twin rule)
    r_wm = (
        right.filter(F.col(right_ts_col).isNotNull())
        .select(
            *[F.col(c).alias(k) for c, k in zip(key_cols, keys)],
            F.col(right_ts_col).alias("_rts"),
            *[F.col(c).alias(slots[c]) for c in payload],
        )
        .withWatermark("_rts", watermark)
    )
    # eqNullSafe, not ==: the batch twin's Window.partitionBy groups
    # NULL keys together, so a NULL-key left row CAN carry a NULL-key
    # right row — a null-unsafe join key here silently NULL-padded
    # those rows instead (ADVICE r7). <=> is still an equi-join key
    # (ExtractEquiJoinKeys handles EqualNullSafe), so the streaming
    # symmetric hash join and its state eviction are unchanged.
    cond = F.lit(True)
    for c, k in zip(key_cols, keys):
        cond = cond & F.col(c).eqNullSafe(F.col(k))
    cond = (
        cond
        & (F.col("_rts") <= F.col(ts_col))
        & (
            F.col("_rts")
            > F.col(ts_col) - F.expr(f"INTERVAL {int(horizon_seconds)} SECOND")
        )
    )
    joined = l_wm.join(r_wm, cond, "leftOuter")

    # the carry's ordering field is unix_micros(_rts), NOT _rts itself:
    # _rts carries the right stream's watermark tag through the join,
    # and a tagged column inside the carried struct leaves the
    # aggregation output with a SECOND event-time column besides the
    # window — with payload slots present this merely risks confusion,
    # but with an EMPTY payload the struct is all-event-time and the
    # agg silently never emits a closed window (measured; micros order
    # identically and NULL maps to NULL, so semantics are unchanged)
    carry = F.max(
        F.struct(
            F.unix_micros(F.col("_rts")).alias("_t"),
            *[F.col(slots[c]).alias(slots[c]) for c in payload],
        )
    ).alias("_carry")
    grouped = joined.groupBy(
        F.window(F.col(ts_col), emit_window).alias("_win"),
        F.unix_micros(F.col(ts_col)).alias("_lts"),
        *[F.col(c) for c in lcols if c != ts_col],
    ).agg(carry)
    return grouped.select(
        *[
            F.timestamp_micros(F.col("_lts")).alias(c) if c == ts_col
            else F.col(c)
            for c in lcols
        ],
        *[F.col(f"_carry.{slots[c]}").alias(out_name(c)) for c in payload],
    )
