"""Time-expression parser tests (F12/F13 — doc/index.rst:353-383)."""

from __future__ import annotations

import datetime as dt

import pytest

from pond_spark.timeparse import parse_time_spec, since_until

NOW = dt.datetime(2024, 6, 15, 13, 45, 30)


def test_now_today_yesterday_tomorrow():
    assert parse_time_spec("now", NOW) == (NOW, dt.timedelta(0))
    assert parse_time_spec("today", NOW) == (dt.datetime(2024, 6, 15), dt.timedelta(days=1))
    assert parse_time_spec("yesterday", NOW) == (dt.datetime(2024, 6, 14), dt.timedelta(days=1))
    assert parse_time_spec("tomorrow", NOW) == (dt.datetime(2024, 6, 16), dt.timedelta(days=1))


def test_relative_offsets():
    assert parse_time_spec("-1h", NOW)[0] == NOW - dt.timedelta(hours=1)
    assert parse_time_spec("-30s", NOW)[0] == NOW - dt.timedelta(seconds=30)
    assert parse_time_spec("+2d", NOW)[0] == NOW + dt.timedelta(days=2)
    assert parse_time_spec("-5m", NOW)[0] == NOW - dt.timedelta(minutes=5)


def test_partial_dates_imply_duration():
    start, dur = parse_time_spec("2019-02-04", NOW)
    assert start == dt.datetime(2019, 2, 4)
    assert dur == dt.timedelta(days=1)
    start, dur = parse_time_spec("2019-02", NOW)
    assert (start, dur) == (dt.datetime(2019, 2, 1), dt.timedelta(days=28))
    start, dur = parse_time_spec("2020", NOW)
    assert (start, dur) == (dt.datetime(2020, 1, 1), dt.timedelta(days=366))


def test_full_timestamps():
    start, dur = parse_time_spec("2019-02-04T12:30", NOW)
    assert (start, dur) == (dt.datetime(2019, 2, 4, 12, 30), dt.timedelta(minutes=1))
    start, dur = parse_time_spec("2019-02-04 12:30:45", NOW)
    assert (start, dur) == (dt.datetime(2019, 2, 4, 12, 30, 45), dt.timedelta(seconds=1))


def test_time_of_day_uses_today():
    start, dur = parse_time_spec("09:15", NOW)
    assert (start, dur) == (dt.datetime(2024, 6, 15, 9, 15), dt.timedelta(minutes=1))


def test_since_until_whole_day_coverage():
    # until=2019-02-04 covers the whole day (src/client/Main.cxx:169-178)
    lo, hi = since_until(since="2019-02-01", until="2019-02-04", now=NOW)
    assert lo == dt.datetime(2019, 2, 1)
    assert hi == dt.datetime(2019, 2, 4, 23, 59, 59, 999999)


def test_date_shortcut_spans_24h():
    lo, hi = since_until(date="2024-03-10", now=NOW)
    assert lo == dt.datetime(2024, 3, 10)
    assert hi == dt.datetime(2024, 3, 10, 23, 59, 59, 999999)


def test_today_shortcut():
    lo, hi = since_until(today=True, now=NOW)
    assert lo == dt.datetime(2024, 6, 15)
    assert hi == dt.datetime(2024, 6, 15, 23, 59, 59, 999999)


def test_unparseable_raises():
    with pytest.raises(ValueError):
        parse_time_spec("not-a-time", NOW)


# ---------------------------------------------------------------------------
# property tests (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st

_dates = st.datetimes(
    min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2099, 12, 31)
)


@settings(max_examples=200, deadline=None)
@given(
    sign=st.sampled_from("+-"),
    n=st.integers(min_value=0, max_value=10**6),
    unit=st.sampled_from("smhd"),
    now=_dates,
)
def test_relative_offset_roundtrip(sign, n, unit, now):
    secs = {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit] * n
    delta = dt.timedelta(seconds=secs)
    ok = (
        now <= dt.datetime.max - delta
        if sign == "+"
        else now >= dt.datetime.min + delta
    )
    if not ok:
        # out-of-range offsets must fail cleanly, not overflow
        with pytest.raises(ValueError):
            parse_time_spec(f"{sign}{n}{unit}", now)
        return
    start, dur = parse_time_spec(f"{sign}{n}{unit}", now)
    assert dur == dt.timedelta(0)
    assert start == now + (1 if sign == "+" else -1) * dt.timedelta(seconds=secs)


@settings(max_examples=200, deadline=None)
@given(d=_dates)
def test_partial_date_covers_whole_day(d):
    spec = d.strftime("%Y-%m-%d")
    start, dur = parse_time_spec(spec, d)
    assert start == dt.datetime(d.year, d.month, d.day)
    assert dur == dt.timedelta(days=1)
    # until semantics: start+dur-1µs is still inside the day
    lo, hi = since_until(until=spec, now=d)
    assert hi == start + dt.timedelta(days=1) - dt.timedelta(microseconds=1)
    assert hi.date() == d.date()


@settings(max_examples=100, deadline=None)
@given(d=_dates)
def test_month_and_year_durations_are_calendar_exact(d):
    y_start, y_dur = parse_time_spec(f"{d.year:04d}", d)
    assert y_start == dt.datetime(d.year, 1, 1)
    assert y_start + y_dur == dt.datetime(d.year + 1, 1, 1)
    m_start, m_dur = parse_time_spec(f"{d.year:04d}-{d.month:02d}", d)
    assert m_start == dt.datetime(d.year, d.month, 1)
    nxt = (
        dt.datetime(d.year + 1, 1, 1)
        if d.month == 12
        else dt.datetime(d.year, d.month + 1, 1)
    )
    assert m_start + m_dur == nxt


def test_since_until_point_spec_not_inverted():
    """Regression (r6 review): zero-duration time= specs ('now',
    '-1h') must return the inclusive point, not an inverted empty
    range; and both bounds resolve against ONE clock reading."""
    import datetime as dt

    from pond_spark.timeparse import since_until

    now = dt.datetime(2024, 5, 1, 12, 0, 0)
    lo, hi = since_until(time="now", now=now)
    assert lo == hi == now
    lo, hi = since_until(time="-1h", now=now)
    assert lo == hi == now - dt.timedelta(hours=1)
    # spans still cover their duration
    lo, hi = since_until(time="12:00", now=now)
    assert lo == now and hi == now + dt.timedelta(minutes=1, microseconds=-1)
