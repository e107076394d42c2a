"""Funnel analysis — ordered multi-step conversion over the event
stream: of the users who did step 1, how many went on to do step 2
AFTER it, then step 3 after that, within an optional horizon.

Beyond the reference surface (pond's aggregations stop at top-k
counts); the sessionization/retention sibling in the log-analytics
family (operators/sessionize.py, operators/rollup.py retention).

Shape: one aggregation per step — filter the step's events, semi-join
the previous step's (user, ts) frontier, keep events strictly after
it, take the per-user minimum. Every join and groupBy keys on the
user id alone, so after the first shuffle the chain stays narrow; K
steps = K filtered scans + K user-keyed shuffles (the scans prune on
the step predicate at the source). Counts are exact integers;
conversion is reported as ppm via integer division (PERF_NOTES
hash-stability rule — no float ratios in hashed output).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """``(step_idx, step, n_users, conversion_ppm)`` per funnel step.

    A user counts for step i when they have a step-i event strictly
    after their step-(i-1) frontier time (the earliest qualifying
    chain, computed greedily — the standard funnel semantics);
    ``within_seconds`` bounds the whole chain to a horizon after the
    user's step-1 time. ``conversion_ppm`` is relative to step 1's
    user count (integer division)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    if within_seconds is not None:
        frontier = frontier.withColumn(
            "_deadline",
            F.col("_t") + F.expr(f"INTERVAL {int(within_seconds)} SECOND"),
        )
    # each frontier is both counted AND joined by the next step —
    # persist it so counting step i doesn't re-execute the whole
    # prefix chain (unpersisted, K steps would re-run O(K²) scans).
    # r11 (guide §5): the per-step counts are LAZY one-row aggregates
    # unioned into a single plan instead of K eager .count() driver
    # actions — one job instead of K sequential job launches, no
    # driver-side result assembly. Pins follow the session-lifecycle
    # contract (loop drivers clearCache between queries).
    frontier = frontier.persist()

    def step_count(i: int, s: str, f: DataFrame) -> DataFrame:
        return f.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col("n_users").cast("long").alias("n_users"),
        )

    counts = [step_count(0, steps[0], frontier)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(frontier, user_col)
            .filter(F.col("_ts") > F.col("_t"))
        )
        if within_seconds is not None:
            nxt = nxt.filter(F.col("_ts") <= F.col("_deadline"))
        agg = [F.min("_ts").alias("_t")]
        if within_seconds is not None:
            # the deadline is constant per user; min() is just the
            # deterministic way to carry it through the aggregate
            agg.append(F.min("_deadline").alias("_deadline"))
        frontier = nxt.groupBy(user_col).agg(*agg).persist()
        counts.append(step_count(i, step, frontier))
    all_counts = reduce(lambda a, b: a.unionByName(b), counts)
    base = counts[0].select(
        F.greatest(F.col("n_users"), F.lit(1)).alias("_base")
    )
    return all_counts.crossJoin(F.broadcast(base)).select(
        "step_idx",
        "step",
        "n_users",
        F.expr("n_users * 1000000 div _base").alias("conversion_ppm"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order path analysis: counts of consecutive event-type
    transitions per user stream — the Markov-chain view next to the
    funnel's fixed ordering. ``(from_type, to_type, n)``.

    One window pass partitioned by user (ordered by (ts, id) — the
    engine's standard deterministic tiebreak) + one two-key groupBy;
    both shuffle on narrow keys."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = events.select(
        F.col(type_col).alias("to_type"),
        F.lag(type_col).over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    return steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def event_transitions_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin — identical window order and tiebreak."""
    return f"""
WITH steps AS (
  SELECT {type_col} AS to_type,
         lag({type_col}) OVER (PARTITION BY {user_col}
                               ORDER BY {ts_col}, {id_col}) AS from_type
  FROM {table})
SELECT from_type, to_type, count(*) AS n
FROM steps WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
"""


def funnel_sql(
    steps: Sequence[str],
    within_seconds: int | None = None,
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin — the identical greedy frontier chain, with the
    per-user deadline carried through each CTE like the Spark side."""
    if not steps:  # mirror the Spark twin's guard (was an IndexError)
        raise ValueError("funnel needs at least one step")
    q = lambda s: "'" + s.replace("'", "''") + "'"  # noqa: E731
    # `is not None`, never truthiness: within_seconds=0 is a valid
    # (degenerate) horizon and must behave identically to the Spark
    # side, which also tests `is not None`
    has_dl = within_seconds is not None
    dl0 = (
        f", min({ts_col}) + INTERVAL {int(within_seconds)} SECOND AS dl"
        if has_dl
        else ""
    )
    ctes = [
        f"s1 AS (SELECT {user_col} AS u, min({ts_col}) AS t{dl0} FROM {table} "
        f"WHERE {type_col} = {q(steps[0])} GROUP BY {user_col})"
    ]
    prev = "s1"
    for i, step in enumerate(steps[1:], start=2):
        dl_filter = f" AND e.{ts_col} <= p.dl" if has_dl else ""
        dl_carry = ", min(p.dl) AS dl" if has_dl else ""
        ctes.append(
            f"s{i} AS (SELECT p.u AS u, min(e.{ts_col}) AS t{dl_carry} "
            f"FROM {table} e JOIN {prev} p ON e.{user_col} = p.u "
            f"WHERE e.{type_col} = {q(step)} AND e.{ts_col} > p.t"
            f"{dl_filter} GROUP BY p.u)"
        )
        prev = f"s{i}"
    selects = [
        f"SELECT {i} AS step_idx, {q(s)} AS step, "
        f"(SELECT count(*) FROM s{i}) AS n_users, "
        f"(SELECT count(*) FROM s{i}) * 1000000 // "
        f"greatest((SELECT count(*) FROM s1), 1) AS conversion_ppm"
        for i, s in enumerate(steps, start=1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
