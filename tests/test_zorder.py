"""Z-order clustering (sources/zorder.py): Morton-key correctness and
the locality property that makes min/max pruning work on both dims."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pond_spark.sources.zorder import cluster_by_zorder, rank16, zorder_key


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame([(0b11, 0b00), (0b10, 0b01)], ["x", "y"])
    out = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    # bit b of dim i -> position b*2+i: z(x=0b11,y=0b00)=0b0101=5,
    # z(x=0b10,y=0b01)=0b0110=6
    assert [r.z for r in out] == [5, 6]


def test_zorder_key_bit_budget():
    import pytest

    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 4, bits=16)  # 64 > 63


def test_rank16_order_preserving_for_time(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rows = [(t0 + dt.timedelta(minutes=m),) for m in (0, 1, 2, 30)]
    df = spark.createDataFrame(rows, "ts timestamp")
    ranks = [
        r[0]
        for r in df.select(rank16(F.col("ts"), "timestamp").alias("r")).collect()
    ]
    assert ranks == sorted(ranks)
    assert ranks[1] - ranks[0] == 1  # minute granularity


def test_rank16_time_of_day_bounds_and_order(spark):
    """The in-date time rank must stay within 16 bits for the WHOLE
    day — the old fractional-minute scaling overflowed to 65579 for
    23:59:02+, wrapping end-of-day rows next to midnight — and must be
    monotone in second-of-day."""
    import datetime as dt

    from pond_spark.sources.zorder import rank16_time_of_day

    t0 = dt.datetime(2024, 1, 1)
    times = [
        t0,
        t0 + dt.timedelta(hours=12),
        t0 + dt.timedelta(hours=23, minutes=59, seconds=2),  # overflow zone
        t0 + dt.timedelta(hours=23, minutes=59, seconds=59),
    ]
    df = spark.createDataFrame([(t,) for t in times], "ts timestamp")
    ranks = [
        r.r
        for r in df.select(rank16_time_of_day(F.col("ts")).alias("r"))
        .orderBy("ts")
        .collect()
    ]
    assert ranks == sorted(ranks)
    assert all(0 <= r <= 65535 for r in ranks), ranks
    assert ranks[0] == 0 and ranks[-1] == 65535
    assert ranks[2] > 65000  # end-of-day stays at the top of the range


def test_cluster_locality_bounds_both_dims(spark):
    """After z-clustering, consecutive key-ordered chunks span SMALL
    rectangles of (site-hash, minute) space — the property row-group
    min/max stats need to prune on either dim. Compare the mean
    per-chunk time-span against the site-major layout, where every
    site stripe spans the whole day."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f"site{i % 50}", t0 + dt.timedelta(minutes=(i * 7) % 1440))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "site string, ts timestamp")

    def mean_chunk_minutes(frame):
        # frame arrives in its final layout order (single partition);
        # chunk it into 100-row "row groups" and measure the time span
        rows = frame.select("ts").collect()
        chunks = [rows[i : i + 100] for i in range(0, len(rows), 100)]
        spans = [
            (max(r.ts for r in ch) - min(r.ts for r in ch)).total_seconds() / 60
            for ch in chunks
        ]
        return sum(spans) / len(spans)

    one = df.coalesce(1)
    zdf = cluster_by_zorder(one, ["site", "ts"], partitions=1)
    zspan = mean_chunk_minutes(zdf)
    sitespan = mean_chunk_minutes(one.orderBy("site", "ts"))
    # site-major stripes span most of the day (~>700 min); z-chunks
    # must be far tighter on time while still clustering sites
    assert zspan < sitespan / 2, (zspan, sitespan)


def test_logstore_zorder_roundtrip(spark, tmp_path):
    """Z-ordered store: append/read round-trips exactly, time-bounded
    reads prune, and the layout keeps both dims clustered."""
    import datetime as dt

    from pond_spark.schema import LOG_SCHEMA
    from pond_spark.sources.store import LogStore

    base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(1000):
        r = dict(base)
        r.update(
            id=i,
            timestamp=t0 + dt.timedelta(minutes=(i * 13) % 1440),
            site=f"s{i % 20}",
            type="http_access",
        )
        rows.append(tuple(r[f.name] for f in LOG_SCHEMA.fields))
    df = spark.createDataFrame(rows, LOG_SCHEMA)

    store = LogStore(spark, str(tmp_path / "z"), zorder=("site", "timestamp"))
    store.append(df)
    assert store.read().count() == 1000
    bounded = store.read(
        since=t0 + dt.timedelta(hours=6), until=t0 + dt.timedelta(hours=7)
    )
    expect = df.filter(
        (F.col("timestamp") >= t0 + dt.timedelta(hours=6))
        & (F.col("timestamp") <= t0 + dt.timedelta(hours=7))
    ).count()
    assert bounded.count() == expect


def test_zorder_date_dimension(spark):
    """Regression (r4 review): DATE has no direct numeric cast in
    Spark, so z-ordering by a date column threw DATATYPE_MISMATCH —
    both rank16 and the normalized cluster_by_zorder path must accept
    it and preserve date ordering in the rank."""
    import datetime as ddt

    from pond_spark.sources.zorder import cluster_by_zorder, rank16

    df = spark.createDataFrame(
        [(i, ddt.date(2024, 1, 1 + i), f"s{i % 3}") for i in range(12)],
        "id long, d date, site string",
    )
    ranks = [
        r.r
        for r in df.orderBy("id")
        .select(rank16(F.col("d"), "date").alias("r"))
        .collect()
    ]
    assert ranks == sorted(ranks) and len(set(ranks)) == 12

    out = cluster_by_zorder(df, ["d", "site"])
    assert out.count() == 12  # plans + executes without a cast error


def test_cluster_by_zorder_four_dims_default_bits(spark):
    """Regression (r4 review): the module header promises 2-4 dims at
    the default config, but 4x16 bits tripped zorder_key's 63-bit
    guard — cluster_by_zorder now auto-shrinks bits per dim."""
    df = spark.createDataFrame(
        [(i, float(i), f"s{i % 3}", i % 7) for i in range(40)],
        "a long, b double, site string, c long",
    )
    out = cluster_by_zorder(df, ["a", "b", "site", "c"])
    assert out.count() == 40


def test_logstore_compact_preserves_zorder_and_conf(spark, tmp_path):
    """Regression (r6 review): compact() must rewrite with the
    CONFIGURED layout — a z-ordered store stays Morton-clustered after
    compaction (files within a date cover disjoint _zkey ranges, like
    a fresh append) — and store writes must not leak
    outputTimestampType into the session."""
    import datetime as dt

    from pond_spark.schema import LOG_SCHEMA
    from pond_spark.sources.store import LogStore
    from pond_spark.sources.zorder import rank16, rank16_time_of_day, zorder_key

    key = "spark.sql.parquet.outputTimestampType"
    spark.conf.set(key, "INT96")
    try:
        base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
        t0 = dt.datetime(2024, 1, 1)

        def batch(lo, hi):
            rows = []
            for i in range(lo, hi):
                r = dict(base)
                r.update(
                    id=i,
                    timestamp=t0 + dt.timedelta(minutes=(i * 13) % 1440),
                    site=f"s{i % 20}",
                    type="http_access",
                )
                rows.append(tuple(r[f.name] for f in LOG_SCHEMA.fields))
            return spark.createDataFrame(rows, LOG_SCHEMA)

        store = LogStore(
            spark, str(tmp_path / "zc"), zorder=("site", "timestamp")
        )
        for k in range(4):  # several appends -> several files per date
            store.append(batch(k * 250, (k + 1) * 250))
        assert spark.conf.get(key) == "INT96"  # append didn't leak

        removed = store.compact(target_file_bytes=1 << 30)
        assert sum(removed.values()) > 0  # something actually rewrote
        assert spark.conf.get(key) == "INT96"  # compact didn't leak
        assert store.read().count() == 1000

        # clustering check: per file, rows occupy a contiguous zkey
        # range disjoint from every other file's (range-partitioned
        # write) — this fails if compact rewrote with the plain sort
        zk = zorder_key(
            [
                rank16(F.col("site"), "string"),
                rank16_time_of_day(F.col("timestamp")),
            ]
        )
        per_file = (
            store.read()
            .withColumn("_f", F.col("_metadata.file_path"))
            .withColumn("_zk", zk)
            .groupBy("_f")
            .agg(F.min("_zk").alias("lo"), F.max("_zk").alias("hi"))
            .collect()
        )
        spans = sorted((r.lo, r.hi) for r in per_file)
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, spans  # disjoint zkey ranges per file
    finally:
        spark.conf.unset(key)
