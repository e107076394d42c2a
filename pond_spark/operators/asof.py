"""As-of join — for each left row, the latest right row at or before
its timestamp (per key). The log-native enrichment join Spark lacks:
attach the most recent config change / deploy / session marker to
every log record.

Spark-first composition (no Pandas, one shuffle):

1. tag and union both sides on (key, ts) — right rows carry their
   payload, left rows carry NULL payload;
2. one window per key ordered by (ts, side) with
   ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   frame — the classic carry-forward;
3. keep the left rows: each now holds the payload of the nearest
   right row with ``r.ts <= l.ts`` (ties resolve to the right row:
   right sorts before left at equal ts).

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
    A payload column whose name collides with a left column is emitted
    as ``asof_<name>`` (left columns always win their own names) —
    without the rename, left rows would carry their OWN value through
    the ignorenulls carry-forward and the output would hold two
    identically-named columns (r4 review finding).
    """
    right_ts_col = right_ts_col or ts_col
    payload = [
        c for c in right.columns if c not in (*key_cols, right_ts_col)
    ]
    lcols = left.columns

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
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(slots[c]), ignorenulls=True)
            .over(w)
            .alias(f"_carry_{slots[c]}")
            for c in payload
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_carry_{slots[c]}").alias(out_name(c)) for c in payload],
    )
    return out
