"""Retention job — the Spark-storage analog of the reference's ring
buffer + max_age reaper (SURVEY.md §1.3).

The reference evicts oldest-first when the arena fills
(/root/reference/src/Database.cxx:31-51, test/TestDatabase.cxx:61-70)
and reaps records older than ``max_age`` once a minute
(/root/reference/src/Instance.cxx:34,190-203). With Parquet the
granularity is the file: drop whole files whose newest timestamp is
too old (max_age) and then oldest-first until under the size budget.

File-level min/max come from the Parquet footers (no data scan), so the
job's cost is O(#files). Readers get snapshot isolation per query (the
file listing is fixed at planning time) — strictly stronger than the
reference's live-cursor FixDeleted repair (src/Cursor.cxx:8-16).
"""

from __future__ import annotations

import datetime as dt
import glob
import os
from dataclasses import dataclass


@dataclass
class RetentionReport:
    dropped_age: list[str]
    dropped_size: list[str]
    remaining_bytes: int


def _file_stats(path: str) -> tuple[int, dt.datetime | None]:
    """(bytes, max timestamp) from the parquet footer."""
    import pyarrow.parquet as pq

    size = os.path.getsize(path)
    try:
        md = pq.ParquetFile(path).metadata
        newest = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for c in range(row_group.num_columns):
                col = row_group.column(c)
                if col.path_in_schema not in ("timestamp", "ts"):
                    continue
                stats = col.statistics
                if stats is not None and stats.has_min_max:
                    mx = stats.max
                    if isinstance(mx, dt.datetime):
                        if mx.tzinfo is not None:  # TIMESTAMP_MICROS is UTC-adjusted
                            mx = mx.astimezone(dt.timezone.utc).replace(tzinfo=None)
                        if newest is None or mx > newest:
                            newest = mx
        return size, newest
    except Exception:
        return size, None


def apply_retention(
    store_dir: str,
    max_age: dt.timedelta | None = None,
    max_bytes: int | None = None,
    now: dt.datetime | None = None,
    dry_run: bool = False,
) -> RetentionReport:
    """Drop aged files, then oldest-first down to the size budget.

    Local-filesystem stores only — and LOUDLY so: the reaper lists via
    glob, and on an hdfs://-style store an empty listing would return
    a clean "nothing to drop" report while retention silently never
    evicts (the r7 sidecar class of bug). On a cluster, run retention
    where the storage is mounted, or port the listing to the Hadoop
    FileSystem API (catalog._HadoopFS has the primitives)."""
    from pond_spark.catalog import _is_local_path

    if not _is_local_path(store_dir):
        raise ValueError(
            f"apply_retention lists via the local filesystem; {store_dir!r} "
            "has a scheme — a silent empty listing would report nothing to "
            "drop while never evicting"
        )
    now = now or dt.datetime.utcnow()
    if now.tzinfo is not None:
        # file stats are naive-UTC; an aware `now` (the modern
        # datetime.now(timezone.utc) idiom) would make the age compare
        # raise TypeError — normalize instead of crashing the reaper
        now = now.astimezone(dt.timezone.utc).replace(tzinfo=None)
    # flat layouts and LogStore's p_date=… partition dirs both retain
    # at file granularity; emptied partition dirs are pruned afterwards
    files = sorted(
        glob.glob(os.path.join(store_dir, "*.parquet"))
        + glob.glob(os.path.join(store_dir, "p_date=*", "*.parquet"))
    )
    stats = {f: _file_stats(f) for f in files}

    dropped_age: list[str] = []
    if max_age is not None:
        cutoff = now - max_age
        for f in files:
            _, newest = stats[f]
            if newest is not None and newest < cutoff:
                dropped_age.append(f)
    # SET membership for the per-file scans: list membership made the
    # reaper O(files * dropped) — quadratic at the ~800k-file counts
    # the module is dimensioned for (r6 review finding)
    dropped_age_set = set(dropped_age)
    live = [f for f in files if f not in dropped_age_set]

    dropped_size: list[str] = []
    if max_bytes is not None:
        total = sum(stats[f][0] for f in live)
        # oldest-first (ring-buffer eviction order): sort by newest ts,
        # files without stats considered oldest
        by_age = sorted(
            live, key=lambda f: (stats[f][1] or dt.datetime.min)
        )
        for f in by_age:
            if total <= max_bytes:
                break
            dropped_size.append(f)
            total -= stats[f][0]

    if not dry_run:
        for f in dropped_age + dropped_size:
            os.remove(f)
        for d in glob.glob(os.path.join(store_dir, "p_date=*")):
            if not glob.glob(os.path.join(d, "*.parquet")):
                # only checksum/marker droppings remain — clear them
                for leftover in os.listdir(d):
                    os.remove(os.path.join(d, leftover))
                os.rmdir(d)

    dropped_all = dropped_age_set | set(dropped_size)
    remaining = sum(stats[f][0] for f in files if f not in dropped_all)
    return RetentionReport(dropped_age, dropped_size, remaining)
