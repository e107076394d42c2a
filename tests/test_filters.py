"""Predicate-surface tests — every semantic corner in SURVEY.md §2.2,
mirroring the reference's filter evaluator behavior
(/root/reference/src/Filter.cxx)."""

from __future__ import annotations

import datetime as dt

import pytest

from pond_spark.filters import FilterSpec, QueryValidationError


def ids(logs, spec):
    return sorted(r.id for r in logs.filter(spec.to_column()).select("id").collect())


def test_empty_filter_matches_all(logs):
    assert ids(logs, FilterSpec()) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_site_set_or_semantics(logs):
    assert ids(logs, FilterSpec(sites=frozenset({"a", "b"}))) == [1, 2, 5, 6, 8]


def test_empty_site_matches_null_site(logs):
    # Filter.cxx:15-19 — NULL site coerces to "" before the set test
    assert ids(logs, FilterSpec(sites=frozenset({""}))) == [3, 4]


def test_null_host_never_matches(logs):
    # Filter.cxx:22-26 — MatchFilter requires a value; NULL host fails
    assert ids(logs, FilterSpec(hosts=frozenset({"h1"}))) == [1, 5, 6]
    assert ids(logs, FilterSpec(hosts=frozenset({""}))) == [4]


def test_time_range_inclusive_and_null_ts_excluded(logs):
    # Filter.hxx:42-47 — inclusive bounds; no-timestamp records fail
    spec = FilterSpec(since=dt.datetime(2024, 1, 1, 11), until=dt.datetime(2024, 1, 2, 9))
    assert ids(logs, spec) == [2, 3, 4]
    # until exactly on a record's timestamp → included
    spec = FilterSpec(until=dt.datetime(2024, 1, 1, 10))
    assert ids(logs, spec) == [1]


def test_status_half_open(logs):
    # Filter.hxx:73-75 — begin <= status < end
    assert ids(logs, FilterSpec(status_begin=400, status_end=500)) == [2, 6, 8]
    # single-value convention: end = begin + 1 (client/Main.cxx:195-212)
    assert ids(logs, FilterSpec(status_begin=500, status_end=501)) == [3]


def test_duration_longer_null_never_matches(logs):
    assert ids(logs, FilterSpec(duration_longer_us=500_000)) == [2, 5, 6]


def test_method_set_and_unsafe(logs):
    assert ids(logs, FilterSpec(methods=frozenset({"GET", "HEAD"}))) == [1, 4, 8]
    # unsafe = method present and not RFC-9110-safe (Filter.cxx:42)
    assert ids(logs, FilterSpec(unsafe_method=True)) == [2, 5, 6]


def test_uri_exact_and_prefix(logs):
    assert ids(logs, FilterSpec(uri="/api/v1/x")) == [1, 6]
    assert ids(logs, FilterSpec(uri_prefix="/api/v1/")) == [1, 5, 6]
    assert ids(logs, FilterSpec(uri_prefix="/api")) == [1, 2, 5, 6, 8]


def test_type_filter(logs):
    assert ids(logs, FilterSpec(type="http_error")) == [3]


def test_conjunction(logs):
    spec = FilterSpec(
        sites=frozenset({"a"}),
        methods=frozenset({"GET", "DELETE"}),
        status_begin=200,
        status_end=500,
    )
    assert ids(logs, spec) == [1, 6]


def test_method_unsafe_mutual_exclusion():
    with pytest.raises(QueryValidationError):
        FilterSpec(methods=frozenset({"GET"}), unsafe_method=True).validate()


def test_status_range_requires_both():
    with pytest.raises(QueryValidationError):
        FilterSpec(status_begin=400).validate()


def test_has_one_site():
    assert FilterSpec(sites=frozenset({"a"})).has_one_site
    assert not FilterSpec(sites=frozenset({"a", "b"})).has_one_site
