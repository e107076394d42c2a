"""Property-based cross-check: random FilterSpec combinations evaluated
by the Spark compiler vs FilterSpec.to_sql on DuckDB over the same rows
(SURVEY.md §5 test plan item 4)."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest

from pond_spark.filters import FilterSpec
from tests.conftest import make_log_rows


def random_spec(rng: random.Random) -> FilterSpec:
    kw = {}
    r = rng.random()
    if r < 0.4:
        kw["sites"] = frozenset(
            rng.sample(["a", "b", "c", "", "zz"], rng.randint(1, 3))
        )
    elif r < 0.5:
        # empty set == attribute not set (reference sends no filter);
        # must compile to no predicate, not `IN ()`
        kw["sites"] = frozenset()
    if rng.random() < 0.3:
        kw["hosts"] = frozenset(rng.sample(["h1", "h2", "", "nope"], rng.randint(1, 2)))
    if rng.random() < 0.2:
        kw["generators"] = frozenset(rng.sample(["gen-a", "gen-b", "", "nope"], rng.randint(1, 2)))
    if rng.random() < 0.3:
        kw["type"] = rng.choice(["http_access", "http_error", "ssh", "job"])
    if rng.random() < 0.4:
        kw["since"] = dt.datetime(2024, 1, rng.randint(1, 3), rng.randint(0, 23))
    if rng.random() < 0.4:
        # deliberately allowed to land BEFORE `since` (degenerate
        # since>until window): both engines must agree on the empty set
        kw["until"] = dt.datetime(2024, 1, rng.randint(1, 3), rng.randint(0, 23))
    if rng.random() < 0.3:
        b = rng.choice([200, 204, 301, 400, 404, 500])
        # end == begin is a degenerate half-open range matching nothing
        kw["status_begin"], kw["status_end"] = b, b + rng.choice([0, 1, 100])
    if rng.random() < 0.3:
        kw["duration_longer_us"] = rng.choice([0, 999, 1000, 500_000, 10**9])
    if rng.random() < 0.3:
        kw["methods"] = frozenset(rng.sample(["GET", "POST", "HEAD", "PUT"], rng.randint(1, 2)))
    elif rng.random() < 0.2:
        kw["unsafe_method"] = True
    if rng.random() < 0.25:
        kw["uri_prefix"] = rng.choice(["/api", "/api/v1/", "/static", "/"])
    elif rng.random() < 0.2:
        kw["uri"] = rng.choice(["/api/v1/x", "/index.html", "/nope"])
    return FilterSpec(**kw)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    pdf = pd.DataFrame(make_log_rows())
    con.register("logs_src", pdf)
    con.execute("CREATE TABLE logs AS SELECT * FROM logs_src")
    return con


def test_random_filters_match_duckdb(logs, duck):
    """>=200 random FilterSpec combinations per run (VERDICT r4 ask
    #6), covering empty-site sets, degenerate since>until windows and
    empty status ranges alongside the full attribute surface."""
    rng = random.Random(1234)
    degenerate_windows = empty_status = 0
    for i in range(200):
        spec = random_spec(rng)
        if spec.since and spec.until and spec.since > spec.until:
            degenerate_windows += 1
        if spec.status_begin is not None and spec.status_begin == spec.status_end:
            empty_status += 1
        spark_ids = sorted(
            r.id for r in logs.filter(spec.to_column()).select("id").collect()
        )
        duck_ids = sorted(
            r[0]
            for r in duck.execute(
                f"SELECT id FROM logs WHERE {spec.to_sql()}"
            ).fetchall()
        )
        assert spark_ids == duck_ids, f"iteration {i}: {spec} → {spark_ids} vs {duck_ids}"
    # the generator must actually exercise the degenerate classes
    assert degenerate_windows >= 5
    assert empty_status >= 3


def test_method_mask_unsafe_exclusivity():
    """F8+F9 mutual exclusion (Connection.cxx:552-567): BOTH compilers
    must reject the combination identically, for every mask size."""
    from pond_spark.filters import QueryValidationError

    rng = random.Random(42)
    for _ in range(20):
        spec = FilterSpec(
            methods=frozenset(rng.sample(["GET", "POST", "HEAD", "PUT", "DELETE"], rng.randint(1, 4))),
            unsafe_method=True,
        )
        with pytest.raises(QueryValidationError):
            spec.to_column()
        with pytest.raises(QueryValidationError):
            spec.to_sql()
    # one-sided statuses are rejected too
    for kw in ({"status_begin": 200}, {"status_end": 300}):
        with pytest.raises(QueryValidationError):
            FilterSpec(**kw).to_column()


def test_quote_bearing_literals_match_duckdb(spark, duck):
    """to_sql must escape string literals in EVERY attribute — a URI
    (or site/host/type) containing a single quote flows through the
    oracle path unchanged. Regression for the unescaped uri/type
    builders (VERDICT r1 'What's wrong' #2)."""
    import duckdb as _duckdb
    from pond_spark.schema import LOG_SCHEMA

    rows = []
    base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
    uris = ["/o'brien", "/it''s", "/plain", "/o'", None]
    for i, uri in enumerate(uris):
        r = dict(base)
        r.update(id=i + 1, site=f"s'{i % 2}", host="h'x", type="we'ird",
                 http_uri=uri, http_method="GET")
        rows.append(r)
    df = spark.createDataFrame(rows, LOG_SCHEMA)
    con = _duckdb.connect()
    con.register("qlogs_src", pd.DataFrame(rows))
    con.execute("CREATE TABLE qlogs AS SELECT * FROM qlogs_src")

    specs = [
        FilterSpec(uri="/o'brien"),
        FilterSpec(uri="/it''s"),
        FilterSpec(uri_prefix="/o'"),
        FilterSpec(type="we'ird"),
        FilterSpec(sites=frozenset({"s'0", "s'1"})),
        FilterSpec(hosts=frozenset({"h'x"})),
        FilterSpec(type="we'ird", uri="/o'brien", uri_prefix="/o'"),
    ]
    for spec in specs:
        spark_ids = sorted(
            r.id for r in df.filter(spec.to_column()).select("id").collect()
        )
        duck_ids = sorted(
            r[0]
            for r in con.execute(
                f"SELECT id FROM qlogs WHERE {spec.to_sql()}"
            ).fetchall()
        )
        assert spark_ids == duck_ids, f"{spec} → {spark_ids} vs {duck_ids}"
        assert spark_ids, f"{spec} matched nothing — fixture broken"


def test_random_windows_match_duckdb(logs, duck):
    """Q4 pagination property: random (filter, max, skip) — the
    window's (timestamp, id) order makes the page deterministic, so
    Spark and DuckDB must return the exact same id sequence."""
    rng = random.Random(99)
    for i in range(25):
        spec = random_spec(rng)
        mx, sk = rng.randint(1, 12), rng.choice([0, 1, 3, 10])
        from pond_spark.query import Query

        got = [
            r.id
            for r in Query(logs).filter(spec).window(max=mx, skip=sk).to_df()
            .select("id").collect()
        ]
        want = [
            r[0]
            for r in duck.execute(
                f'SELECT id FROM logs WHERE {spec.to_sql()} '
                f'ORDER BY "timestamp" ASC NULLS FIRST, id ASC '
                f"LIMIT {mx} OFFSET {sk}"
            ).fetchall()
        ]
        assert got == want, f"iteration {i}: {spec} max={mx} skip={sk}"


def test_random_group_site_matches_duckdb(logs, duck):
    """Q5 pagination property: random (max, skip) over non-empty sites
    in first-appearance order."""
    rng = random.Random(7)
    from pond_spark.query import Query

    for i in range(12):
        mx, sk = rng.randint(1, 4), rng.choice([0, 1, 2, 5])
        got = sorted(
            r.id
            for r in Query(logs).group_site(max=mx, skip=sk).to_df()
            .select("id").collect()
        )
        want = sorted(
            r[0]
            for r in duck.execute(
                "WITH fs AS (SELECT site, min(id) AS fid FROM logs "
                "WHERE site IS NOT NULL GROUP BY site), "
                "rk AS (SELECT site, row_number() OVER (ORDER BY fid) AS r FROM fs) "
                f"SELECT l.id FROM logs l JOIN rk USING (site) "
                f"WHERE r > {sk} AND r <= {sk + mx}"
            ).fetchall()
        )
        assert got == want, f"iteration {i}: max={mx} skip={sk}"
