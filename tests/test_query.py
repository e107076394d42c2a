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
