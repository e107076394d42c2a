"""Bloom prefilter, integer PageRank, Count-Min sketch table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pond_spark.dedup.bloom import (
    bloom_prefilter_new,
    build_bloom,
    mark_membership,
)
from pond_spark.operators.pagerank import click_edges, pagerank
from pond_spark.operators.sketches import (
    build_cm_sketches,
    cm_estimate_over_range,
    update_cm_sketches,
)

M, K = 4096, 5


def test_bloom_no_false_negatives(spark):
    cat = spark.createDataFrame([(i * 7919,) for i in range(100)], ["key"])
    bloom = build_bloom(cat, "key", M, K)
    probe = spark.createDataFrame([(i * 7919,) for i in range(200)], ["key"])
    out = mark_membership(probe, bloom, "key", M, K).collect()
    members = {r.key for r in out if r.might_contain}
    # every true member flagged — the Bloom guarantee
    assert {i * 7919 for i in range(100)} <= members


def test_bloom_null_key_never_contains(spark):
    cat = spark.createDataFrame([(1,), (2,)], ["key"])
    bloom = build_bloom(cat, "key", M, K)
    probe = spark.createDataFrame([(None,), (1,)], "key long")
    got = {
        r.key: r.might_contain
        for r in mark_membership(probe, bloom, "key", M, K).collect()
    }
    assert got[1] is True and got[None] is False


def test_bloom_prefilter_equals_plain_anti_join(spark):
    cat = spark.createDataFrame([(i,) for i in range(0, 500, 3)], ["key"])
    batch = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(400)], ["key", "text"]
    )
    fast = bloom_prefilter_new(batch, cat, "key", m_bits=M, k=K)
    plain = batch.join(cat, "key", "left_anti")
    assert sorted((r.key, r.text) for r in fast.collect()) == sorted(
        (r.key, r.text) for r in plain.collect()
    )


def test_bloom_probe_is_broadcast_only(spark):
    """The membership probe is ONE 1-row broadcast of the dense bitmap
    (scalar-cross BroadcastNestedLoopJoin) + pure index expressions —
    never a shuffle-side join on the probe relation, and no longer k
    separate broadcast builds (r11)."""
    cat = spark.createDataFrame([(i,) for i in range(50)], ["key"])
    bloom = build_bloom(cat, "key", M, K)
    probe = spark.createDataFrame([(i,) for i in range(100)], ["key"])
    plan = (
        mark_membership(probe, bloom, "key", M, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_two_cycle_fixed_point(spark):
    """a<->b is symmetric: every iteration returns exactly the initial
    mass — integer arithmetic, no drift."""
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert got == {"a": 1_000_000, "b": 1_000_000}


def test_pagerank_chain_exact_values(spark):
    """a->b with no back-edge: a decays to the teleport floor after
    iter 1, b settles at teleport + d*teleport."""
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert got["a"] == 150_000
    assert got["b"] == 150_000 + (85 * 150_000) // 100


def test_pagerank_hub_ranks_highest(spark):
    """The node pointed to by everyone outranks the teleport-floor
    leaves (b, c have no in-edges); a — the hub's sole outlink —
    inherits the hub's whole rank, so it too sits above the floor."""
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        ["src", "dst"],
    )
    got = {r.node: r.rank for r in pagerank(edges, iterations=8).collect()}
    assert got["hub"] > got["b"] == got["c"] == 150_000
    assert got["a"] > got["b"]


def test_click_edges_per_user_transitions(spark):
    t0 = dt.datetime(2024, 1, 1, 10)
    rows = [
        # user u1: x -> y -> x ; user u2: y -> y (self-loop dropped)
        (1, t0, "u1", "x"),
        (2, t0 + dt.timedelta(minutes=1), "u1", "y"),
        (3, t0 + dt.timedelta(minutes=2), "u1", "x"),
        (4, t0, "u2", "y"),
        (5, t0 + dt.timedelta(minutes=1), "u2", "y"),
        (6, None, "u2", "z"),  # NULL ts excluded
    ]
    logs = spark.createDataFrame(
        rows, "id long, timestamp timestamp, remote_host string, message string"
    )
    got = {(r.src, r.dst) for r in click_edges(logs).collect()}
    assert got == {("x", "y"), ("y", "x")}


def _cm_logs(spark, rows):
    return spark.createDataFrame(rows, "timestamp timestamp, message string")


def test_cm_estimate_overestimates_never_under(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10)
    rows = []
    for i, (key, n) in enumerate([("a", 30), ("b", 7), ("c", 1)]):
        rows += [(t0 + dt.timedelta(seconds=i), key)] * n
    logs = _cm_logs(spark, rows)
    path = str(tmp_path / "cm")
    build_cm_sketches(logs, path, width=64)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], ["key"])
    got = {
        r.key: r.est
        for r in cm_estimate_over_range(
            spark, path, keys, "2024-01-01", "2024-01-01", width=64
        ).collect()
    }
    assert got["a"] >= 30 and got["b"] >= 7 and got["c"] >= 1
    # total mass bounds any single estimate
    assert all(v <= 38 for v in got.values())


def test_cm_update_equals_rebuild(spark, tmp_path):
    d1, d2 = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    day1 = [(d1, k) for k in ["a", "a", "b"]]
    day2 = [(d2, k) for k in ["a", "c", "c", "c"]]
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_cm_sketches(_cm_logs(spark, day1), inc)
    update_cm_sketches(_cm_logs(spark, day2), inc)
    build_cm_sketches(_cm_logs(spark, day1 + day2), full)
    a = sorted(
        (r.day, r.row, r.col, r.cnt)
        for r in spark.read.parquet(inc).collect()
    )
    b = sorted(
        (r.day, r.row, r.col, r.cnt)
        for r in spark.read.parquet(full).collect()
    )
    assert a == b
    # range query over both days: a appears 3x total
    keys = spark.createDataFrame([("a",)], ["key"])
    est = cm_estimate_over_range(
        spark, inc, keys, "2024-01-01", "2024-01-02"
    ).collect()[0].est
    assert est >= 3


def test_cm_day_filter_prunes_partitions(spark, tmp_path):
    """The range read reaches the sketch table as a partition filter."""
    d1, d2 = dt.datetime(2024, 1, 1, 9), dt.datetime(2024, 1, 2, 9)
    path = str(tmp_path / "cm")
    build_cm_sketches(_cm_logs(spark, [(d1, "a"), (d2, "b")]), path)
    sub = spark.read.parquet(path).filter(F.col("day") == "2024-01-01")
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan


# ---------------------------------------------------------------------------
# CUSUM, corpus drift, BPE


def test_cusum_closed_form_matches_recursion(spark):
    """Hand-solved series with a gap hour; scores must equal the
    textbook recursion s_t = max(0, s_{t-1} + x_t - k)."""
    t0 = dt.datetime(2024, 1, 1, 0)
    counts = {0: 10, 2: 30, 3: 30, 4: 5, 5: 25}  # hour 1 is a gap
    rows = []
    i = 0
    for h, n in counts.items():
        for _ in range(n):
            rows.append((i, t0 + dt.timedelta(hours=h), "s"))
            i += 1
    logs = spark.createDataFrame(
        rows, "id long, timestamp timestamp, site string"
    )
    from pond_spark.operators.anomaly import cusum_anomalies, cusum_scores

    got = {
        r.hour.hour: (r.cnt, r.cusum)
        for r in cusum_scores(logs, k=10).collect()
    }
    assert got == {
        0: (10, 0),
        1: (0, 0),
        2: (30, 20),
        3: (30, 40),
        4: (5, 35),
        5: (25, 50),
    }
    alerts = {r.hour.hour for r in cusum_anomalies(logs, k=10, h=34).collect()}
    assert alerts == {3, 4, 5}


def _pyfp(word: str) -> int:
    h = 0
    for c in word:
        h = (h * 31 + ord(c)) % 1_000_000_007
    return h


def test_corpus_drift_matches_python_replay(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa bb bb cc", "A"),
            (2, "aa aa dd", "A"),
            (3, "bb bb bb ee", "B"),
            (4, "cc dd dd", "B"),
            (5, "zz zz", "C"),  # in neither slice
        ],
        "doc_id long, text string, grp string",
    )
    from pond_spark.operators.drift import corpus_drift

    nb = 16
    got = corpus_drift(
        docs, F.col("grp") == "A", F.col("grp") == "B", n_buckets=nb, top=16
    ).collect()

    import collections

    ca: dict[int, int] = collections.Counter()
    cb: dict[int, int] = collections.Counter()
    for text, grp in [
        ("aa bb bb cc", "A"),
        ("aa aa dd", "A"),
        ("bb bb bb ee", "B"),
        ("cc dd dd", "B"),
    ]:
        for w in text.strip().lower().split():
            if grp == "A":
                ca[_pyfp(w) % nb] += 1
            else:
                cb[_pyfp(w) % nb] += 1
    ta, tb = sum(ca.values()), sum(cb.values())
    exp = {}
    for bkt in set(ca) | set(cb):
        pa = ca[bkt] * 1_000_000 // max(ta, 1)
        pb = cb[bkt] * 1_000_000 // max(tb, 1)
        exp[bkt] = (ca[bkt], cb[bkt], pa, pb, pa - pb)
    assert {
        r.bucket: (r.cnt_a, r.cnt_b, r.ppm_a, r.ppm_b, r.delta_ppm)
        for r in got
    } == exp


def _ref_bpe(word_counts, n, min_pair=2):
    vocab = {tuple(w) + ("</w>",): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n + 1):
        pairs: dict = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = (
                    pairs.get((sym[i], sym[i + 1]), 0) + c
                )
        cand = [(v, a, b) for (a, b), v in pairs.items() if v >= min_pair]
        if not cand:
            break
        best = sorted(cand, key=lambda t: (-t[0], t[1], t[2]))[0]
        merges.append((rank, best[1], best[2], best[0]))
        new: dict = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[1]
                    and sym[i + 1] == best[2]
                ):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges, vocab


_BPE_DOCS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "new new lower"),
]


def _bpe_word_counts():
    import collections

    wc: dict = collections.Counter()
    for _, text in _BPE_DOCS:
        for w in text.strip().lower().split():
            wc[w] += 1
    return wc


def test_bpe_train_matches_reference(spark):
    from pond_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, 8).orderBy("rank").collect()
    ]
    exp, _ = _ref_bpe(_bpe_word_counts(), 8)
    assert got == exp


def test_bpe_train_sql_matches_reference():
    """The DuckDB twin's unrolled merge replay must equal the
    pure-Python reference exactly — merges AND the segmented top-word
    sample (the delimiter-replace rewrite is the greedy leftmost
    rule)."""
    import duckdb

    from pond_spark.functions.bpe import bpe_train_sql

    values = ", ".join(
        f"({i}, '{t}')" for i, t in _BPE_DOCS
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {values})"
        " AS t(doc_id, text)"
    )
    got = con.sql(bpe_train_sql(8, n_sample=3)).fetchall()
    exp_merges, ref_vocab = _ref_bpe(_bpe_word_counts(), 8)
    merges = sorted(r for r in got if r[0] <= 100)
    assert [tuple(m) for m in merges] == exp_merges
    # sample rows: top-3 words by (cnt DESC, word), final pieces
    wc = _bpe_word_counts()
    top = sorted(wc.items(), key=lambda t: (-t[1], t[0]))[:3]
    ref_pieces = {"".join(sym)[: -len("</w>")]: list(sym) for sym in ref_vocab}
    exp_sample = [
        (101 + i, w, " ".join(ref_pieces[w]), c)
        for i, (w, c) in enumerate(top)
    ]
    sample = sorted(r for r in got if r[0] > 100)
    assert [tuple(s) for s in sample] == exp_sample


def test_bpe_corpus_has_no_delimiter_collision():
    """bpe_train_sql wraps symbols in chr(1); the testdata corpus must
    contain no control characters for the delimiter to be safe (the
    equivalence argument in functions/bpe.py relies on this)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            "SELECT count(*) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            r"WHERE regexp_matches(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]')"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} docs contain control chars"


def test_bpe_segment_roundtrip_and_reference(spark):
    from pond_spark.functions.bpe import bpe_segment, bpe_train

    docs = spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")
    merges = [
        (r.left, r.right) for r in bpe_train(docs, 8).orderBy("rank").collect()
    ]
    seg = bpe_segment(docs, merges).collect()
    # reassembly: pieces always concatenate back to word + </w>
    for r in seg:
        assert "".join(r.pieces) == r.word + "</w>"
    # exact piece sequences match the reference apply
    _, ref_vocab = _ref_bpe(_bpe_word_counts(), 8)
    ref_pieces = {"".join(sym)[: -len("</w>")]: list(sym) for sym in ref_vocab}
    for r in seg:
        assert list(r.pieces) == ref_pieces[r.word]


def test_bpe_tokenize_rollup_matches_reference(spark):
    """Per-doc (n_words, n_pieces) from the segmentation equals the
    independent pure-python reference, and the DuckDB twin
    (bpe_tokenize_sql) agrees exactly."""
    import duckdb

    from pond_spark.functions.bpe import bpe_segment, bpe_tokenize_sql, bpe_train
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")
    merges = [
        (r.left, r.right) for r in bpe_train(docs, 8).orderBy("rank").collect()
    ]
    got = {
        r.doc: (r.n_words, r.n_pieces)
        for r in bpe_segment(docs, merges)
        .groupBy(F.col("doc_id").alias("doc"))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
        )
        .collect()
    }
    _, ref_vocab = _ref_bpe(_bpe_word_counts(), 8)
    np_by_word = {"".join(sym)[: -len("</w>")]: len(sym) for sym in ref_vocab}
    exp = {}
    for doc, text in _BPE_DOCS:
        ws = [w for w in text.strip().lower().split() if w]
        exp[doc] = (len(ws), sum(np_by_word[w] for w in ws))
    assert got == exp

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in _BPE_DOCS)
        + ") AS t(doc_id, text)"
    )
    sql_rows = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.sql(bpe_tokenize_sql(8)).fetchall()
    }
    assert sql_rows == exp


# ---------------------------------------------------------------------------
# UniMax budget allocation


def _ref_unimax_quotas(sizes: dict, budget: int, epochs: int) -> dict:
    """Independent replay of the documented closed form: fund the
    largest prefix (capacity asc) whose cap fits the even split of
    the remaining budget; everyone after gets the floor-even share."""
    order = sorted(sizes.items(), key=lambda kv: (epochs * kv[1], kv[0]))
    L = len(order)
    caps = [epochs * s for _, s in order]
    prefix = 0
    k, spent = 0, 0
    for i, c in enumerate(caps, start=1):
        prefix += c
        if c * (L - i + 1) <= budget - (prefix - c):
            k, spent = i, prefix
    out = {}
    for i, (lang, s) in enumerate(order, start=1):
        if i <= k:
            out[lang] = epochs * s
        else:
            out[lang] = max((budget - spent) // max(L - k, 1), 0)
    return out


def test_unimax_quotas_match_reference(spark):
    from pond_spark.operators.unimax import unimax_quotas

    rows = []
    sizes = {"aa": 100, "bb": 400, "cc": 2000, "dd": 5000}
    i = 0
    for lang, total in sizes.items():
        # split each language's mass over a few docs
        for part in (total // 2, total - total // 2):
            rows.append((i, lang, part))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    for budget, epochs in [(3000, 2), (100_000, 2), (50, 1), (0, 3)]:
        got = {
            r.lang: r.quota
            for r in unimax_quotas(docs, budget, epochs).collect()
        }
        exp = _ref_unimax_quotas(sizes, budget, epochs)
        assert got == exp, (budget, epochs)
        assert sum(got.values()) <= max(budget, sum(exp.values()))
        for lang, q in got.items():
            assert 0 <= q <= epochs * sizes[lang]


def test_unimax_select_respects_quota_and_determinism(spark):
    from pond_spark.operators.unimax import unimax_quotas, unimax_select

    rows = [(i, "aa" if i % 3 else "bb", 50 + (i % 7) * 10) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    sel = unimax_select(docs, budget=1500, epochs=1).collect()
    quotas = {
        r.lang: r.quota for r in unimax_quotas(docs, 1500, 1).collect()
    }
    by_lang: dict = {}
    for r in sel:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert sum(r.size for r in rs) <= quotas[lang]
    # deterministic: second run identical
    sel2 = unimax_select(docs, budget=1500, epochs=1).collect()
    assert sorted(r.doc_id for r in sel) == sorted(r.doc_id for r in sel2)
    # greedy prefix property: selected ids are a prefix in shuffle-key
    # order — no selected doc has a larger key than an unselected one
    # that would still have fit entirely before it
    all_keys = {
        r.doc_id: r.shuffle_key
        for r in unimax_select(docs, budget=10**9, epochs=10).collect()
    }
    for lang, rs in by_lang.items():
        chosen = {r.doc_id for r in rs}
        max_chosen = max(all_keys[d] for d in chosen)
        skipped = [
            d
            for d, k in all_keys.items()
            if d not in chosen and k < max_chosen and (d % 3 == 0) == (lang == "bb")
        ]
        assert not skipped


def test_unimax_precomputed_frames_identical(spark):
    """r11 guide §1.2: the sizes/quotas reuse parameters must be pure
    plumbing — passing the precomputed frame yields exactly what the
    internal recomputation produced."""
    from pond_spark.operators.unimax import unimax_quotas, unimax_select

    rows = [(i, "aa" if i % 3 else "bb", 50 + (i % 7) * 10) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    sizes = (
        docs.filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
        .groupBy(F.col("lang"))
        .agg(F.sum("n_chars").cast("long").alias("size"))
    )
    q_default = sorted(
        tuple(r) for r in unimax_quotas(docs, 1500, 2).collect()
    )
    q_shared = sorted(
        tuple(r)
        for r in unimax_quotas(docs, 1500, 2, sizes=sizes).collect()
    )
    assert q_default == q_shared
    sel_default = sorted(
        tuple(r) for r in unimax_select(docs, 1500, 2).collect()
    )
    sel_shared = sorted(
        tuple(r)
        for r in unimax_select(
            docs, 1500, 2, quotas=unimax_quotas(docs, 1500, 2, sizes=sizes)
        ).collect()
    )
    assert sel_default == sel_shared


def test_bpe_train_local_and_distributed_paths_identical(spark):
    """r11 guide §8: below BPE_LOCAL_TRAIN_MAX_VOCAB the merge loop
    runs driver-side on the collected vocabulary. Both paths must
    yield the identical merge table (and match the pure-Python
    reference) — the merge chain is an oracle-replayed artifact."""
    from pond_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")
    local = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, 8).orderBy("rank").collect()
    ]
    dist = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, 8, local_vocab_bound=0)
        .orderBy("rank")
        .collect()
    ]
    exp, _ = _ref_bpe(_bpe_word_counts(), 8)
    assert local == dist == exp
