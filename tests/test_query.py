"""Query-builder tests: canonical ordering, WINDOW pagination, LAST
reverse semantics, GROUP_SITE contract, Q8 exclusions — behavior ports
of the reference's Database tests (test/TestDatabase.cxx:48-97,211-423)."""

from __future__ import annotations

import pytest

from pond_spark.filters import FilterSpec, QueryValidationError
from pond_spark.query import Query


def col_ids(df):
    return [r.id for r in df.select("id").collect()]


def test_scan_order_is_timestamp_then_id(logs):
    out = col_ids(Query(logs).to_df())
    # id 5 has NULL timestamp → first (nulls_first); rest chronological
    assert out == [5, 1, 2, 3, 4, 6, 7, 8]


def test_window_limit_offset(logs):
    q = Query(logs).window(max=3, skip=2)
    assert col_ids(q.to_df()) == [2, 3, 4]
    assert col_ids(Query(logs).window(max=2).to_df()) == [5, 1]


def test_last_returns_most_recent(logs):
    assert col_ids(Query(logs).last().to_df()) == [8]
    spec = FilterSpec(sites=frozenset({"a"}))
    assert col_ids(Query(logs).filter(spec).last().to_df()) == [6]


def test_last_with_until(logs):
    import datetime as dt

    spec = FilterSpec(until=dt.datetime(2024, 1, 2, 23))
    assert col_ids(Query(logs).filter(spec).last().to_df()) == [6]


def test_group_site_first_appearance_order(logs):
    # sites by first appearance (min id): a(1), b(2), ""(4), c(7);
    # NULL-site records unreachable via GROUP_SITE
    out = Query(logs).group_site(max=10).to_df()
    rows = [(r.site, r.id) for r in out.collect()]
    assert rows == [
        ("a", 5), ("a", 1), ("a", 6),   # site a block, (ts,id) order, NULL ts first
        ("b", 2), ("b", 8),
        ("", 4),
        ("c", 7),
    ]


def test_group_site_pagination_skips_sites(logs):
    out = Query(logs).group_site(max=2, skip=1).to_df()
    rows = [(r.site, r.id) for r in out.collect()]
    assert rows == [("b", 2), ("b", 8), ("", 4)]


def test_group_site_nonempty_sites_only(logs):
    # filter matches sites a/b only → pagination ranks only those
    spec = FilterSpec(methods=frozenset({"GET", "POST"}))
    out = Query(logs).filter(spec).group_site(max=1, skip=1).to_df()
    rows = [(r.site, r.id) for r in out.collect()]
    assert rows == [("b", 2), ("b", 8)]


@pytest.mark.parametrize(
    "build",
    [
        lambda q: q.filter(FilterSpec(sites=frozenset({"a"}))).group_site(1),
        lambda q: q.last().window(1),
        lambda q: q.last().group_site(1),
        lambda q: q.follow().window(1),
        lambda q: q.follow().continue_(),
        lambda q: q.continue_().group_site(1),
        lambda q: q.last().follow(),
    ],
)
def test_mutual_exclusions(logs, build):
    with pytest.raises(QueryValidationError):
        build(Query(logs)).validate()


def test_unlimited_window_and_group_site_window(spark):
    """Regression (r4 review): (1) the grammar's unlimited window
    (uint64 max) crashed DataFrame.limit (Java 32-bit int) — at or
    beyond the int bound it now means 'no limit clause'; (2) a WINDOW
    over GROUP_SITE was silently dropped — the reference applies
    skip/max over the grouped record stream."""
    import datetime as ddt

    from pond_spark.query import Query

    t0 = ddt.datetime(2024, 1, 1, 10)
    rows = []
    rid = 0
    for site in ("s1", "s2", "s3"):
        for k in range(4):
            rid += 1
            rows.append((rid, t0 + ddt.timedelta(seconds=rid), site))
    df = spark.createDataFrame(rows, "id long, timestamp timestamp, site string")

    # unlimited window = all rows, no crash
    out = Query(df).window(max=2**64 - 1, skip=0).to_df().collect()
    assert len(out) == 12
    # unlimited with skip still offsets
    out = Query(df).window(max=2**64 - 1, skip=10).to_df().collect()
    assert [r.id for r in out] == [11, 12]

    # window over group_site: grouped stream order is (site-rank, ts,
    # id) = ids 1..12 here; skip 5 take 4 -> ids 6..9
    out = (
        Query(df).group_site(max=10, skip=0).window(max=4, skip=5).to_df().collect()
    )
    assert [r.id for r in out] == [6, 7, 8, 9]
