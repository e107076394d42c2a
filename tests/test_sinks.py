"""Sink tests: text/jsonl/gzip/per-site/raw round-trip."""

from __future__ import annotations

import glob
import gzip as gzmod
import json
import os

from pond_spark.sinks import write_jsonl, write_per_site, write_raw, write_text


def _read_lines(path, pattern="part-*"):
    lines = []
    for f in sorted(glob.glob(os.path.join(path, pattern))):
        if f.endswith(".gz"):
            with gzmod.open(f, "rt") as fh:
                lines += [l.rstrip("\n") for l in fh]
        elif not f.endswith(".crc"):
            with open(f) as fh:
                lines += [l.rstrip("\n") for l in fh]
    return [l for l in lines if l]


def test_write_text(logs, tmp_path):
    out = str(tmp_path / "text")
    write_text(logs, out)
    lines = _read_lines(out)
    assert len(lines) == 8
    assert any(l.startswith("a 1.2.3.4 ") for l in lines)


def test_write_text_gzip(logs, tmp_path):
    out = str(tmp_path / "textgz")
    write_text(logs, out, gzip=True)
    assert glob.glob(os.path.join(out, "part-*.gz"))
    assert len(_read_lines(out, "part-*.gz")) == 8


def test_write_jsonl_drops_nulls(logs, tmp_path):
    out = str(tmp_path / "jsonl")
    write_jsonl(logs, out)
    recs = [json.loads(l) for l in _read_lines(out)]
    assert len(recs) == 8
    by_site = {r.get("site"): r for r in recs}
    # null fields absent, not null-valued (FormatJson absent-if-unset)
    assert all("host" not in r or r["host"] is not None for r in recs)
    assert by_site["c"]["message"] == "login"
    assert "http_status" not in by_site["c"]


def test_write_per_site_tree(logs, tmp_path):
    out = str(tmp_path / "persite")
    write_per_site(logs, out)
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out, "_site_dir=*"))
    )
    # sites a, b, c; "" and NULL unsanitizable → skipped
    assert dirs == ["_site_dir=a", "_site_dir=b", "_site_dir=c"]
    a_lines = _read_lines(os.path.join(out, "_site_dir=a"))
    assert len(a_lines) == 3
    # show_site auto-off in per-site files: line starts with remote_host
    assert all(not l.startswith("a ") for l in a_lines)


def test_write_per_site_sharded(logs, tmp_path):
    out = str(tmp_path / "persite_sh")
    write_per_site(logs, out, shard=True)
    assert glob.glob(os.path.join(out, "_shard=a/_site_dir=a"))


def test_write_raw_roundtrip(logs, spark, tmp_path):
    out = str(tmp_path / "raw")
    write_raw(logs, out)
    back = spark.read.parquet(out)
    assert back.count() == 8
    assert set(back.columns) == set(logs.columns)
    orig = {tuple(r) for r in logs.collect()}
    got = {tuple(r) for r in back.collect()}
    assert orig == got


def test_write_per_site_visitor_scope_resets(spark, tmp_path):
    """P3 hard-case (SURVEY §4 item 5): visitor ids are scoped to the
    output file — the same client in two site files gets two distinct
    opaque ids; the id is appended as the line's last column."""
    import datetime as dt

    from pond_spark.schema import LOG_SCHEMA

    t0 = dt.datetime(2024, 1, 1, 10)
    base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
    rows = []
    for i, site in ((1, "alpha"), (2, "alpha"), (3, "beta")):
        r = dict(base)
        r.update(
            id=i,
            timestamp=t0 + dt.timedelta(minutes=i),
            site=site,
            type="http_access",
            host="h.example",
            remote_host="10.0.0.1",
        )
        rows.append(r)
    df = spark.createDataFrame(rows, LOG_SCHEMA)
    out = str(tmp_path / "vs")
    write_per_site(df, out, visitors=True)

    def ids(site):
        lines = _read_lines(os.path.join(out, f"_site_dir={site}"))
        return {l.rsplit(" ", 1)[-1] for l in lines}

    alpha, beta = ids("alpha"), ids("beta")
    assert alpha != {"-"} and beta != {"-"}
    assert len(alpha) == 1  # same visitor within the 30-min window
    assert alpha.isdisjoint(beta)  # per-file scope: ids reset


def test_write_packet_socket_roundtrip(logs, tmp_path):
    """S8: one datagram per record to an AF_UNIX DGRAM socket; the
    received datagrams re-ingest losslessly through the S1 parser."""
    import socket

    from pond_spark.sinks.writers import write_packet_socket
    from pond_spark.sources.ingest import parse_datagrams

    addr = str(tmp_path / "pond.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    rx.bind(addr)
    rx.settimeout(30)
    try:
        write_packet_socket(logs, addr)
        dgrams = [rx.recv(65536).decode() for _ in range(8)]
    finally:
        rx.close()
    assert len(dgrams) == 8
    spark = logs.sparkSession
    back = (
        parse_datagrams(
            spark.createDataFrame([(d,) for d in dgrams], ["payload"])
        )
        .filter("NOT _malformed")
        .select("_rec.*")
    )
    got = {(r.site, r.http_status) for r in back.collect()}
    want = {(r.site, r.http_status) for r in logs.collect()}
    assert got == want


def test_write_packet_socket_seqpacket_and_oversize(spark, tmp_path):
    """S8 hardening: SOCK_SEQPACKET is the reference's other packet
    type; oversized records follow the chosen policy instead of
    failing the task with EMSGSIZE mid-stage."""
    import socket

    import pytest as _pytest

    from pond_spark.sinks.writers import write_packet_socket

    df = spark.createDataFrame(
        [(1, "ok"), (2, "x" * 5000)], "id long, payload string"
    ).coalesce(1)

    # oversize=error: actionable failure naming the cap
    addr_e = str(tmp_path / "e.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    rx.bind(addr_e)
    try:
        with _pytest.raises(Exception, match="max_datagram_bytes"):
            write_packet_socket(df, addr_e, max_datagram_bytes=1024)
    finally:
        rx.close()

    # oversize=skip: small record arrives, big one dropped
    addr_s = str(tmp_path / "s.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    rx.bind(addr_s)
    rx.settimeout(30)
    try:
        write_packet_socket(df, addr_s, max_datagram_bytes=1024, oversize="skip")
        one = rx.recv(65536).decode()
    finally:
        rx.close()
    assert '"id":1' in one

    # seqpacket transport: both records round-trip atomically
    addr_q = str(tmp_path / "q.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_SEQPACKET)
    rx.bind(addr_q)
    rx.listen(1)
    rx.settimeout(30)
    got = []

    import threading

    def _accept():
        conn, _ = rx.accept()
        conn.settimeout(30)
        for _ in range(2):
            got.append(conn.recv(65536).decode())
        conn.close()

    t = threading.Thread(target=_accept)
    t.start()
    try:
        # explicit cap: the 5 KB row exceeds the new re-ingest-safe
        # default (MAX_DATAGRAM_SIZE-1); this leg tests TRANSPORT to a
        # non-pond receiver, the documented raise-the-cap case
        write_packet_socket(df, addr_q, seqpacket=True, max_datagram_bytes=65536)
        t.join(30)
    finally:
        rx.close()
    assert sorted(len(g) for g in got) == sorted(
        len(s) for s in (
            '{"id":1,"payload":"ok"}',
            '{"id":2,"payload":"' + "x" * 5000 + '"}',
        )
    )


def test_auto_clone_picks_biggest_peer(logs, tmp_path):
    """S4 (minus Zeroconf): probe candidates, clone from the one with
    the most records, skip unreadable peers."""
    from pond_spark.sources.store import LogStore, auto_clone

    spark = logs.sparkSession
    small = LogStore(spark, str(tmp_path / "small"))
    small.append(logs.limit(3))
    big = LogStore(spark, str(tmp_path / "big"))
    big.append(logs)
    dst = LogStore(spark, str(tmp_path / "dst"))
    chosen = auto_clone(
        dst, [str(tmp_path / "missing"), small.path, big.path]
    )
    assert chosen == big.path
    assert dst.read().count() == logs.count()
    # no readable peer -> None, destination untouched
    assert auto_clone(dst, [str(tmp_path / "nope")]) is None


def test_orc_and_csv_roundtrip_preserve_nulls(logs, tmp_path):
    """Interchange formats: ORC round-trips losslessly; CSV preserves
    the empty-string vs NULL distinction (the F1/F2 empty-site
    semantics) via the nullValue sentinel."""
    from pond_spark.sources.formats import (
        read_logs_csv,
        read_logs_orc,
        write_logs_csv,
        write_logs_orc,
    )

    spark = logs.sparkSession

    def canon(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: t[0],
        )

    orc = str(tmp_path / "orc")
    write_logs_orc(logs, orc)
    assert canon(read_logs_orc(spark, orc)) == canon(logs)

    csv = str(tmp_path / "csv")
    write_logs_csv(logs, csv)
    back = read_logs_csv(spark, csv)
    assert canon(back) == canon(logs)
    # the fixture has both an empty-string host and NULL hosts; both
    # must survive distinctly
    hosts = [r.host for r in back.collect()]
    assert "" in hosts and None in hosts


def test_csv_roundtrip_hostile_values(logs, tmp_path):
    """CSV boundary hardening: embedded newlines survive (multiLine),
    a literal sentinel-shaped value round-trips (escaping), and the
    JSONL reader enforces the schema."""
    import datetime as _dt

    from pond_spark.schema import LOG_SCHEMA
    from pond_spark.sources.formats import (
        read_logs_csv,
        read_logs_jsonl,
        write_logs_csv,
        write_logs_jsonl,
    )

    spark = logs.sparkSession
    base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
    rows = []
    for i, msg in ((1, "line one\nline two"), (2, "\\N"), (3, "\\\\N")):
        r = dict(base)
        r.update(id=i, timestamp=_dt.datetime(2024, 1, 1, 10, 0, i), message=msg)
        rows.append(r)
    df = spark.createDataFrame(rows, LOG_SCHEMA)

    csv = str(tmp_path / "hostile_csv")
    write_logs_csv(df, csv)
    back = {r.id: r.message for r in read_logs_csv(spark, csv).collect()}
    assert back == {1: "line one\nline two", 2: "\\N", 3: "\\\\N"}

    jl = str(tmp_path / "hostile_jsonl")
    write_logs_jsonl(df, jl)
    got = {r.id: r.message for r in read_logs_jsonl(spark, jl).collect()}
    assert got == back


def test_jsonl_interchange_keeps_microseconds(spark, tmp_path):
    """Regression (r4 review): the default JSON timestampFormat
    truncates to milliseconds; (timestamp, id) is the canonical order,
    so the interchange round-trip must keep microseconds exactly."""
    import datetime as ddt

    from pond_spark.schema import LOG_SCHEMA
    from pond_spark.sources.formats import read_logs_jsonl, write_logs_jsonl

    base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
    r = dict(base)
    r.update(
        id=1,
        timestamp=ddt.datetime(2024, 1, 1, 12, 0, 0, 123456),
        site="a",
        type="http_access",
    )
    df = spark.createDataFrame([r], LOG_SCHEMA)
    path = str(tmp_path / "jl")
    write_logs_jsonl(df, path)
    back = read_logs_jsonl(spark, path).collect()[0]
    assert back.timestamp == ddt.datetime(2024, 1, 1, 12, 0, 0, 123456)


def test_per_site_json_field_parity(logs, tmp_path):
    """Regression (r4 review): per-site JSONL leaked the internal id
    column; it must emit the same FormatJson field set as the S6
    stdout sink."""
    import json as _json

    out = str(tmp_path / "psj")
    write_per_site(logs, out, fmt="json")
    recs = [
        _json.loads(l)
        for l in _read_lines(os.path.join(out, "_site_dir=a"), "part-*")
    ]
    assert recs and all("id" not in r for r in recs)
    assert all("_site_dir" not in r for r in recs)


def test_json_sinks_keep_microseconds(spark, tmp_path):
    """Regression (r6 review): the default to_json/write.json
    timestampFormat truncates to milliseconds; the JSONL and packet
    sinks must keep the engine's µs-native precision so round-tripped
    rows compare equal and (timestamp, id) order survives."""
    import datetime as dt
    import glob as _glob

    from pond_spark.schema import LOG_SCHEMA
    from pond_spark.sinks.writers import write_jsonl
    from pond_spark.sources.ingest import parse_datagrams

    base = dict.fromkeys([f.name for f in LOG_SCHEMA.fields])
    base.update(
        id=1,
        timestamp=dt.datetime(2024, 1, 1, 12, 0, 0, 123456),
        site="a",
    )
    df = spark.createDataFrame(
        [tuple(base[f.name] for f in LOG_SCHEMA.fields)], LOG_SCHEMA
    )
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out)
    line = next(
        ln
        for f in _glob.glob(out + "/part-*")
        for ln in open(f)
        if ln.strip()
    )
    assert ".123456" in line  # µs survived serialization
    # S6 is a display projection (no id field), so it is not the wire
    # format — but the timestamp must still parse back µs-exact
    back = (
        parse_datagrams(spark.createDataFrame([(line,)], ["payload"]))
        .select("_rec.timestamp")
        .collect()
    )
    assert back[0].timestamp == dt.datetime(2024, 1, 1, 12, 0, 0, 123456)
    # the packet sink (full row set) round-trips losslessly: covered by
    # test_write_packet_socket_roundtrip with the same timestampFormat


def test_maintenance_works_on_schemed_paths(spark, logs, tmp_path):
    """round-9 #1: the three maintenance paths that refused schemed
    paths in r8 (retention reaper, partition-dir compaction, per-site
    filename rename) now route listings/stats/renames through the
    Hadoop FileSystem API and DO the work. file:// is the in-test
    stand-in for hdfs:// — the exact _HadoopFS code path (globStatus,
    FSDataInputStream footer reads, rename), locally verifiable."""
    import datetime as _dt

    from pond_spark.sinks.writers import write_per_site
    from pond_spark.sources.store import LogStore

    local = tmp_path / "store"
    s = LogStore(spark, f"file://{local}")
    for _ in range(3):  # several small files per date
        s.append(logs)
    n = s.read().count()
    dated = glob.glob(str(local / "p_date=*"))
    files_before = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in dated
    )
    # compaction merges the small files — verified on the LOCAL view
    report = s.compact()
    files_after = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in dated
    )
    assert files_after < files_before
    assert sum(report.values()) == files_before - files_after
    assert s.read().count() == n
    # retention via footer stats over the Hadoop stream: age out all
    # dated files; dirs pruned (the unknown partition has no time
    # stats, so age-based retention correctly leaves it)
    newest = max(
        r.timestamp
        for r in s.read().select("timestamp").collect()
        if r.timestamp is not None
    )
    rep = s.retain(max_age=_dt.timedelta(0), now=newest + _dt.timedelta(days=400))
    assert rep.dropped_age
    assert glob.glob(str(local / "p_date=*")) == [str(local / "p_date=unknown")]
    # per-site rename on a schemed sink
    write_per_site(logs, f"file://{tmp_path}/ps", filename="site.log")
    named = glob.glob(str(tmp_path / "ps" / "_site_dir=*" / "site.log"))
    assert len(named) == 3  # sites a, b, c
    assert not glob.glob(str(tmp_path / "ps" / "_site_dir=*" / "part-*"))


def test_retention_schemed_path_without_session_refuses(monkeypatch):
    """A schemed store with no SparkSession available must fail loudly
    (never the silent empty-listing no-op)."""
    import pytest as _pytest
    from pyspark.sql import SparkSession

    from pond_spark.catalog import _fs_for_maintenance

    monkeypatch.setattr(
        SparkSession, "getActiveSession", staticmethod(lambda: None)
    )
    with _pytest.raises(ValueError, match="SparkSession"):
        _fs_for_maintenance("hdfs://nn/store", spark=None)


def test_per_site_rename_survives_glob_metachars(spark, logs, tmp_path):
    """Late-r8 review finding: the glob-based rename walk must escape
    the output root — a path like run[2026] read as a character class
    would silently skip every rename."""
    out = str(tmp_path / "run[2026]" / "ps")
    write_per_site(logs, out, filename="site.log")
    named = glob.glob(glob.escape(out) + "/_site_dir=*/site.log")
    assert len(named) == 3
    assert not glob.glob(glob.escape(out) + "/_site_dir=*/part-*")
