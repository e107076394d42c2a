"""Round-10 catalog hardening: bounded JSONL sidecars (VERDICT r9 #7),
atomic sidecar commit + torn-tail recovery (ADVICE r9), per-process-
start lease nonce (ADVICE r9), and the bucketed store backend
(VERDICT r9 #3 — the verified embedding gate's vector sibling)."""

from __future__ import annotations

import json
import os

import pytest

from pond_spark.catalog import CatalogStore, WriterLease


def _store(spark, path, **kw):
    return CatalogStore(
        spark, str(path), "k long, v string", "round10 test catalog", **kw
    )


def test_sidecar_history_bounded_and_newest_kept(spark, tmp_path):
    """VERDICT r9 #7: the advisory/retention sidecars must not grow
    one line per snapshot forever. _append_jsonl keeps (amortized) at
    most ~2x keep_last lines on the O(1) local append path, trimming
    to exactly keep_last newest when the byte budget trips."""
    st = _store(spark, tmp_path / "cat")
    side = st.path + ".advise.jsonl"
    for i in range(400):
        st._append_jsonl(side, {"seq": i, "pad": "x" * 40}, keep_last=20)
    hist = st.stats_history()
    assert len(hist) < 400, "no truncation ever engaged"
    assert len(hist) >= 20
    # the kept lines are the NEWEST window, contiguous to the last
    seqs = [h["seq"] for h in hist]
    assert seqs == list(range(400 - len(seqs), 400))


def test_sidecar_append_is_o1_on_local(spark, tmp_path):
    """The local path appends one line (open-append), never rewriting
    prior history below the trim budget — guarded by byte growth:
    appending line k must grow the file by ~len(line), not O(k)."""
    st = _store(spark, tmp_path / "cat")
    side = st.path + ".advise.jsonl"
    for i in range(50):
        st._append_jsonl(side, {"seq": i}, keep_last=10_000)
    size_before = os.path.getsize(side)
    st._append_jsonl(side, {"seq": 50}, keep_last=10_000)
    assert os.path.getsize(side) - size_before < 64


def test_sidecar_long_lines_do_not_retrip_budget(spark, tmp_path):
    """ADVICE r10: the trim budget was sized from the CURRENT line's
    length alone — a file of long historical lines plus short new
    appends kept size > budget while the line count never reached
    keep_last, so every append re-read the whole file (the O(history)
    behavior the budget exists to amortize away). The fix learns the
    observed mean line length at each truncation pass; after ONE
    re-read the budget is re-sized and short appends go back to
    O(1)."""
    st = _store(spark, tmp_path / "cat")
    side = st.path + ".advise.jsonl"
    # 8 long lines (~4 KB each): count 8 <= keep_last 20, but size
    # ~32 KB dwarfs a budget sized from the short lines appended next
    for i in range(8):
        st._append_jsonl(side, {"seq": i, "pad": "y" * 4000}, keep_last=20)

    reads = {"n": 0}
    orig_read = st.fs.read_text

    def counting_read(p):
        reads["n"] += 1
        return orig_read(p)

    st.fs.read_text = counting_read
    for i in range(40):
        st._append_jsonl(side, {"seq": 100 + i}, keep_last=20)
    # at most one learning pass (plus one later legitimate trim once
    # the re-sized budget genuinely trips) — never one read per append
    assert reads["n"] <= 2, f"{reads['n']} full-file re-reads in 40 appends"
    # history still well-formed and bounded, newest lines kept
    seqs = [h["seq"] for h in st.stats_history()]
    assert seqs[-1] == 139 and len(seqs) <= 48


def test_sidecar_torn_tail_and_staged_fallback(spark, tmp_path):
    """ADVICE r9: a crash mid-append can tear only the last line
    (skipped on read, never fatal), and a crash inside the Hadoop-path
    delete-then-rename window leaves only the '._staged' sibling —
    stats_history reads it instead of returning [] over a full
    history."""
    st = _store(spark, tmp_path / "cat")
    side = st.path + ".advise.jsonl"
    st._append_jsonl(side, {"seq": 0}, keep_last=100)
    st._append_jsonl(side, {"seq": 1}, keep_last=100)
    with open(side, "a") as f:
        f.write('{"seq": 2, "truncat')  # torn tail
    assert [h["seq"] for h in st.stats_history()] == [0, 1]

    # staged-only recovery: live file gone mid-swap
    staged = side + "._staged"
    os.rename(side, staged)
    assert [h["seq"] for h in st.stats_history()] == [0, 1]


def test_sidecar_segments_on_schemed_store(spark, tmp_path):
    """VERDICT r10 #7: on schemed stores (no portable append) the
    sidecar rotates SEGMENTS — each append read-rewrites only the
    current segment (<= SIDECAR_SEG_LINES lines), never the full
    history; whole segments past the horizon are deleted along with
    the pre-r11 legacy single file; stats_history merges legacy +
    segments in order, staged-sibling fallback per file."""
    st = _store(spark, "file://" + str(tmp_path / "cat"))
    side = st.path + ".advise.jsonl"
    # seed a pre-r11 LEGACY single file
    st.fs.write_text(
        side, json.dumps({"seq": -2}) + "\n" + json.dumps({"seq": -1}) + "\n"
    )
    # before any truncation, history is legacy + segments, unchanged
    for i in range(5):
        st._append_jsonl(side, {"seq": i}, keep_last=100)
    assert [h["seq"] for h in st.stats_history()] == [-2, -1, 0, 1, 2, 3, 4]

    reads: list[tuple[str, int]] = []
    orig_read = st.fs.read_text

    def counting_read(p):
        t = orig_read(p)
        reads.append((p, len(t.splitlines())))
        return t

    st.fs.read_text = counting_read
    for i in range(5, 300):
        st._append_jsonl(side, {"seq": i}, keep_last=100)
    st.fs.read_text = orig_read
    # every append read ONLY a segment, never the legacy full file,
    # and never more than one segment's worth of lines
    assert all(".seg-" in p for p, _ in reads)
    assert max(n for _, n in reads) <= st.SIDECAR_SEG_LINES
    # rotation happened and the horizon pruned old segments + legacy
    segs = sorted(st.fs.glob(st.fs.glob_escape(side) + ".seg-*"))
    assert 1 <= len(segs) <= 3
    assert not st.fs.exists(side), "legacy file survived the horizon"
    hist = [h["seq"] for h in st.stats_history()]
    assert hist[-1] == 299 and len(hist) >= 100
    assert hist == list(range(hist[0], 300)), "history not contiguous"

    # staged-sibling fallback: live current segment lost mid-rename
    cur = segs[-1]
    st.fs.rename(cur, cur + "._staged")
    hist2 = [h["seq"] for h in st.stats_history()]
    assert hist2 == hist, "staged fallback lost the newest segment"


def test_lease_nonce_blocks_pid_recycling(spark, tmp_path):
    """ADVICE r9: hostname:pid aliases when the OS recycles a pid
    after a crash — the unrelated new process would pass the gate
    're-entrantly' and refresh the stale lease. The per-process-start
    nonce makes the default owner unique per process INSTANCE: a
    lease left by a same-host same-pid EARLIER process start (other
    nonce) refuses until ttl."""
    import pond_spark.catalog as C
    from pond_spark.catalog import LeaseHeldError

    path = str(tmp_path / "cat")
    # the live default owner embeds the process nonce
    assert C._PROCESS_NONCE in C._process_owner()
    # simulate the dead predecessor: same host:pid prefix, other nonce
    stale_owner = C._process_owner().rsplit(":", 1)[0] + ":deadbeef0000"
    WriterLease(spark, path, owner=stale_owner).acquire()  # not released
    with pytest.raises(LeaseHeldError):
        WriterLease(spark, path).acquire()
    # ttl expiry still recovers (the crash-takeover path)
    lease = WriterLease(spark, path, ttl_s=0)
    lease.acquire()
    lease.release()


def test_bucketed_store_roundtrip_and_self_heal(spark, tmp_path):
    """VERDICT r9 #3 backend: a bucket_by store keeps the full
    CatalogStore discipline (append stamps, compact dedups newest-
    stamp, expire evicts, crash remnant refuses) while its FILES are
    hash-bucketed — and the metastore entry is a disposable cache
    re-derived from the path, so a fresh session (or a dropped table)
    self-heals."""
    from pyspark.sql import functions as F

    path = tmp_path / "bstore"
    st = _store(spark, path, bucket_by=(["k"], 4))
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    st.append(rows, run_ts=1000)
    st.append(rows.filter(F.col("k") < 10), run_ts=2000)
    assert st.read().count() == 110

    # compact: one row per key, newest stamp wins
    st.compact()
    got = {(r.k, r.registered_ts) for r in st.read().collect()}
    assert len(got) == 100
    assert all(ts == (2000 if k < 10 else 1000) for k, ts in got)

    # the (re-created post-compact) table keeps the bucket spec — a
    # bare scan won't SHOW bucketing (autoBucketedScan skips it when
    # no operator benefits; the join test below asserts the plan)
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {st._table}").collect()
    }
    assert desc.get("Num Buckets") == "4", desc
    assert "k" in (desc.get("Bucket Columns") or ""), desc

    # expire: old stamps drop, eviction recorded
    rec = st.expire(before_ts=1500)
    assert rec["rows_kept"] == 10
    assert st.read().count() == 10
    assert st.stats_history(suffix=".retention.jsonl")

    # self-heal: losing the metastore entry (fresh session) re-derives
    spark.sql(f"DROP TABLE IF EXISTS {st._table}")
    st2 = _store(spark, path, bucket_by=(["k"], 4))
    assert st2.read().count() == 10

    # crash remnant refuses bootstrap, same as the plain store
    os.rename(str(path), str(path) + "._old")
    spark.sql(f"DROP TABLE IF EXISTS {st._table}")
    with pytest.raises(RuntimeError, match="remnant"):
        _store(spark, path, bucket_by=(["k"], 4)).read()
    os.rename(str(path) + "._old", str(path))


def test_bucketed_store_probe_join_skips_payload_exchange(spark, tmp_path):
    """The point of bucket_by: an equi-join probing the store on the
    bucket key exchanges ONLY the probe side — the store's scan plans
    with no Exchange above it (at 10M vectors/day the r9 plain-parquet
    sibling shuffled ~4 GB of payload per probe)."""
    from pond_spark.plans.inspect import count_exchanges, formatted_plan

    rows = spark.createDataFrame(
        [(i, "p" * 50) for i in range(2000)], "k long, v string"
    )
    bucketed = _store(spark, tmp_path / "b", bucket_by=(["k"], 4))
    bucketed.append(rows)
    plain = _store(spark, tmp_path / "p")
    plain.append(rows)

    probe = spark.range(0, 100).selectExpr("id * 3 as k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        jb = bucketed.read().join(probe, "k")
        jp = plain.read().join(probe, "k")
        assert "Bucketed: true" in formatted_plan(jb)
        # the payload side's exchange disappears; only the probe side
        # (and nothing else) shuffles
        assert count_exchanges(jb) == count_exchanges(jp) - 1
        assert jb.count() == jp.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_sidecar_params_and_lease_discipline(spark, tmp_path):
    """The bucketed backend inherits the sidecar/lease machinery
    unchanged: params pin on first append, leases wrap mutations."""
    from pond_spark.catalog import LeaseHeldError

    path = tmp_path / "bp"
    st = CatalogStore(
        spark, str(path), "k long, v string", "pinned bucketed",
        params={"n": 3}, bucket_by=(["k"], 2),
    )
    st.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert json.loads((tmp_path / "bp.params.json").read_text()) == {"n": 3}
    with pytest.raises(ValueError, match="incomparable"):
        CatalogStore(
            spark, str(path), "k long, v string", "pinned bucketed",
            params={"n": 4}, bucket_by=(["k"], 2),
        )
    foreign = WriterLease(spark, str(path), owner="other:pid-1:x").acquire()
    with pytest.raises(LeaseHeldError):
        st.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    foreign.release()
