"""Generic point-in-interval range join — the bucketed broadcast
strategy behind the GeoIP enrichment (functions/geoip.py,
P4 / ResultWriter.cxx:177-192), generalized to any numeric point
column against any interval dimension (price epochs, value bands,
maintenance windows, session spans).

Why not a plain ``point BETWEEN start AND end`` join: Catalyst plans a
non-equi broadcast join as a nested-loop probe — O(rows × ranges),
unusable against a real dimension at log scale. Here every interval
explodes into the fixed-width buckets it overlaps (short intervals →
tiny fan-out) and the probe equi-joins on its own bucket: a
BroadcastHashJoin with a residual between-predicate, O(rows ×
ranges-per-bucket), and the fact table never shuffles.

Timestamps: cast to epoch seconds/micros first (the caller chooses
the resolution); the operator is deliberately numeric-only so the
bucket arithmetic stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-interval explode cap — far above any sane width choice, low
#: enough that the error beats the OOM
MAX_BUCKETS_PER_INTERVAL = 1_000_000


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: float = 1.0,
    how: str = "inner",
    dim_prefix: str = "interval_",
) -> DataFrame:
    """Join each fact row to every interval containing its point
    (``start <= point <= end``, inclusive both ends — the F5/F7
    convention). ``how`` ∈ {inner, left}; left keeps pointless facts
    with NULL interval columns. ``bucket_width`` trades dimension
    replication (wide buckets) against ranges probed per row (narrow
    buckets); set it near the typical interval length.

    Interval columns whose name collides with a fact column are
    renamed ``dim_prefix + name`` in the output, so every output
    column stays uniquely addressable (a duplicated name would make
    any later select/drop ambiguous or drop both)."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    fact_cols = set(facts.columns)
    for c in [c for c in intervals.columns if c in fact_cols]:
        renamed = dim_prefix + c
        if renamed in fact_cols or renamed in intervals.columns:
            raise ValueError(
                f"range_join: interval column {c!r} collides with a fact "
                f"column and the fallback name {renamed!r} is also taken — "
                "rename one side or pass a different dim_prefix"
            )
        intervals = intervals.withColumnRenamed(c, renamed)
        if start_col == c:
            start_col = renamed
        if end_col == c:
            end_col = renamed
    for df, c in ((facts, "_bkt"), (intervals, "_gbkt")):
        if c in df.columns:
            raise ValueError(f"column {c!r} is reserved by range_join")
    probe = facts.withColumn(
        "_bkt", F.floor(facts[point_col] / F.lit(bucket_width)).cast("long")
    )
    # empty/inverted intervals (start > end, dirty dims) match nothing
    # — and MUST be dropped before bucketing: F.sequence would step -1
    # from first_b down to last_b and can generate a multi-billion-
    # element array (the span guard below only catches positive spans),
    # an executor-OOM class at scale (r6 review fix). NULL bounds fail
    # the comparison and drop too (they could never satisfy the
    # between-predicate).
    intervals = intervals.filter(
        intervals[start_col] <= intervals[end_col]
    )
    first_b = F.floor(intervals[start_col] / F.lit(bucket_width)).cast("long")
    last_b = F.floor(intervals[end_col] / F.lit(bucket_width)).cast("long")
    # lazy sanity guard: an interval spanning an absurd number of
    # buckets (bucket_width far below the interval scale — e.g. a
    # one-week window at default width 1.0 over epoch-micros) would
    # explode the broadcast; fail with an actionable message instead
    # of an executor OOM. Evaluated per dim row at execution — no
    # eager driver action.
    span_ok = F.when(
        last_b - first_b > F.lit(MAX_BUCKETS_PER_INTERVAL),
        F.raise_error(
            F.format_string(
                "range_join: an interval spans %s buckets (cap "
                f"{MAX_BUCKETS_PER_INTERVAL}) — raise bucket_width "
                "toward the typical interval length",
                (last_b - first_b).cast("string"),
            )
        ).cast("long"),
    ).otherwise(last_b)
    dim = intervals.withColumn(
        "_gbkt", F.explode(F.sequence(first_b, span_ok))
    )
    # qualified references: shared column names between facts and
    # intervals (a fact table with its own 'start'/'end') must not
    # make the join condition ambiguous
    cond = (
        (probe["_bkt"] == dim["_gbkt"])
        & (probe[point_col] >= dim[start_col])
        & (probe[point_col] <= dim[end_col])
    )
    return probe.join(F.broadcast(dim), cond, how).drop("_bkt", "_gbkt")
