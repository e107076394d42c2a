"""As-of join — for each left row, the latest right row at or before
its timestamp (per key). The log-native enrichment join Spark lacks:
attach the most recent config change / deploy / session marker to
every log record.

Spark-first composition (no Pandas, one shuffle):

1. tag and union both sides on (key, ts) — right rows carry their
   payload as ONE struct, left rows carry a NULL struct;
2. one window per key ordered by (ts, side) with
   ``max(struct(ts, payload...))`` over an unbounded-preceding frame —
   the latest right row wins as a UNIT, so the output never stitches
   columns from different right rows (the r6 review fix: the previous
   per-slot ``last(ignorenulls)`` carry could combine an old non-NULL
   slot with the newest row's other slots);
3. keep the left rows: each now holds the payload of the nearest
   right row with ``r.ts <= l.ts`` (ties resolve to the right row:
   right sorts before left at equal ts, so it is inside the frame).

Tiebreak: several right rows sharing (key, ts) resolve to the row
with the greatest payload tuple under Spark struct ordering (fields
left-to-right, NULL smallest) — deterministic on any input. SQL
oracles mirror it with ``row_number() ... ORDER BY p1 DESC, p2 DESC
NULLS LAST ... = 1`` per (key, ts).

Scale notes: exactly one shuffle on the join key; per-key windows
stream in ts order (no full materialization). Hot keys are bounded by
key cardinality — for a single global key (key_cols=[]) all rows hit
one window partition, so supply a key at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: internal column names the operator claims on the unioned frame
_RESERVED = ("_side", "_ats", "_carry")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "timestamp",
    right_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the payload columns of the
    latest right row with ``right.ts <= left.ts`` (NULLs when none).

    Right payload = every right column except the keys and timestamp.
    The payload travels as one struct, so the emitted columns always
    come from the SAME right row — including its NULL slots. A payload
    column whose name collides with a left column is emitted as
    ``asof_<name>`` (left columns always win their own names).
    """
    right_ts_col = right_ts_col or ts_col
    payload = [
        c for c in right.columns if c not in (*key_cols, right_ts_col)
    ]
    lcols = left.columns
    for c in _RESERVED:
        if c in lcols or c in right.columns:
            raise ValueError(f"column {c!r} is reserved by asof_join")

    def out_name(c: str) -> str:
        if c not in lcols:
            return c
        renamed = f"asof_{c}"
        if renamed in lcols or renamed in payload:
            raise ValueError(
                f"asof_join: right payload column {c!r} collides with a "
                f"left column and the fallback name {renamed!r} is also "
                "taken — rename one side"
            )
        return renamed

    # internal payload slots are positional (_p0, _p1, …), so a left
    # column sharing a payload name can never leak into the carry
    slots = {c: f"_p{i}" for i, c in enumerate(payload)}

    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(ts_col)
    )
    for c in payload:
        l_tag = l_tag.withColumn(slots[c], F.lit(None))
    # a right row without a timestamp can never be "the latest at or
    # before" anything (SQL comparison semantics: ts >= NULL is false)
    r_tag = (
        right.filter(F.col(right_ts_col).isNotNull())
        .select(
            *[F.col(c) for c in key_cols],
            F.col(right_ts_col).alias("_ats"),
            *[F.col(c).alias(slots[c]) for c in payload],
        )
        .withColumn("_side", F.lit(0))
    )
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(F.col("_ats").asc_nulls_first(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct per right row: (ts, payload...) — max() ignores the
    # NULL struct on left rows and picks the latest right row whole;
    # at equal ts the greatest payload tuple wins (NULL smallest)
    pay = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ats").alias("_t"),
            *[F.col(slots[c]).alias(slots[c]) for c in payload],
        ),
    )
    carried = unioned.select("*", F.max(pay).over(w).alias("_carry"))
    out = carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_carry.{slots[c]}").alias(out_name(c)) for c in payload],
    )
    return out
