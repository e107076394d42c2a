"""End-to-end workflow: the full pond lifecycle on one corpus —
datagram ingest (malformed counting + rate limiting) → LogStore append
→ filtered/windowed queries via the Query builder → per-site file sink.
Mirrors how the reference daemon + client compose
(SURVEY.md §3.1-§3.2)."""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

import pytest

from pond_spark.filters import FilterSpec
from pond_spark.operators.accumulate import accumulate_top
from pond_spark.operators.stats import stats
from pond_spark.query import Query
from pond_spark.sinks.writers import write_per_site
from pond_spark.sources import LogStore, ingest_batch

T0 = dt.datetime(2024, 3, 1, 8)


def _payloads():
    rows = []
    i = 0
    for hour in range(3):
        for site in ("alpha", "beta", "ugly/site"):
            for k in range(4):
                i += 1
                rows.append(
                    json.dumps(
                        {
                            "id": i,
                            "timestamp": (
                                T0 + dt.timedelta(hours=hour, minutes=k)
                            ).isoformat(),
                            "site": site,
                            "type": "http_access",
                            "remote_host": f"10.0.0.{k % 2}",
                            "http_uri": f"/page/{k}",
                            "http_status": 200 + (k % 2) * 204,
                        }
                    )
                )
    rows.append("garbage not json")
    return [(p,) for p in rows]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    raw = spark.createDataFrame(_payloads(), "payload string")
    res = ingest_batch(raw)
    assert res.n_malformed == 1
    s = LogStore(spark, str(base / "store"))
    s.append(res.stored)
    return s


def test_query_window_over_store(store):
    spec = FilterSpec(
        sites=frozenset({"alpha"}),
        since=T0,
        until=T0 + dt.timedelta(hours=1, minutes=30),
    )
    rows = (
        Query(store.read(since=spec.since, until=spec.until))
        .filter(spec)
        .window(max=5, skip=2)
        .to_df()
        .collect()
    )
    assert len(rows) == 5
    assert all(r.site == "alpha" for r in rows)
    # deterministic (timestamp, id) page
    ts_ids = [(r.timestamp, r.id) for r in rows]
    assert ts_ids == sorted(ts_ids)


def test_last_and_accumulate_over_store(store):
    last = Query(store.read()).filter(
        FilterSpec(sites=frozenset({"beta"}))
    ).last().to_df().collect()
    assert len(last) == 1
    assert last[0].timestamp == max(
        r.timestamp
        for r in store.read().filter("site = 'beta'").collect()
    )
    top = accumulate_top(store.read(), "remote_host", 2).collect()
    assert len(top) == 2
    assert top[0]["count"] >= top[1]["count"]


def test_stats_over_store(store):
    row = stats(store.read()).collect()[0]
    assert row.n_records == 36


def test_per_site_sink_tree(store, tmp_path):
    out = str(tmp_path / "sites")
    write_per_site(store.read(), out)
    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/_site_dir=*")
    )
    # site names sanitized for the filesystem ('ugly/site' → 'ugly_site')
    assert names == [
        "_site_dir=alpha", "_site_dir=beta", "_site_dir=ugly_site"
    ]
    for name in names:
        files = glob.glob(f"{out}/{name}/*")
        assert files
