"""Physical-plan inspection helpers.

The reference hard-codes its physical strategies (index selection,
predicate-inside-scan, reverse seek — SURVEY.md §4); on Spark the
equivalent guarantees come from Catalyst, so the engine's tests assert
them on the *optimized physical plan* instead of trusting the API
surface: filters reach the Parquet scan (`PushedFilters`), small dims
broadcast (`BroadcastHashJoin`), aggregations combine map-side
(partial `HashAggregate`), scans prune columns (`ReadSchema`), and the
shuffle count stays at the plan's theoretical minimum.

These helpers parse ``df.explain("formatted")`` output — stable across
Spark 3.x/4.x for the node names asserted here.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)  # one optimizer pass, both checks
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan contains a map-side (partial) aggregate —
    the 'combine before shuffle' guarantee."""
    return "partial_" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every Parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def _split_top_level(s: str) -> list[str]:
    """Split a struct body on commas OUTSIDE <>/() nesting — a bare
    split would shred parametrized types (decimal(12,2), array<...>)
    into garbage column names."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names read by each Parquet scan (column-pruning check).

    The struct body is extracted with a DEPTH SCAN, not a lazy regex:
    ``struct<tags:array<string>,site:string>`` ends at the BALANCED
    closing ``>``, and a ``(.*?)>`` capture would stop at array's
    inner ``>`` — silently dropping every column after the first
    nested type and making pruning assertions pass/fail vacuously
    (r6 review finding, verified by repro)."""
    plan = formatted_plan(df)
    out = []
    marker = "ReadSchema: struct<"
    i = 0
    while True:
        j = plan.find(marker, i)
        if j < 0:
            break
        k = j + len(marker)
        depth, body = 1, []
        while k < len(plan):
            ch = plan[k]
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
                if depth == 0:
                    break
            body.append(ch)
            k += 1
        cols = [
            c.split(":")[0].strip()
            for c in _split_top_level("".join(body))
            if c.strip()
        ]
        out.append(cols)
        i = k
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))
