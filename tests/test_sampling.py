"""Deterministic sampling, mixture weighting, shard packing."""

from pyspark.sql import functions as F


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_sample_deterministic_and_monotone(spark):
    from pond_spark.operators.sampling import sample

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    s10 = _ids(sample(df, 0.10))
    s50 = _ids(sample(df, 0.50))
    # consistent-hash property: smaller rate is a subset of larger
    assert s10 <= s50
    # roughly proportional (universal hash, 2000 ids)
    assert 120 <= len(s10) <= 280 and 850 <= len(s50) <= 1150
    # partitioning-independent: same set from a repartitioned input
    assert _ids(sample(df.repartition(13), 0.10)) == s10
    # salt changes the set
    assert _ids(sample(df, 0.10, salt="other")) != s10


def test_stratified_rates(spark):
    from pond_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, {"en": 1.0, "de": 0.2}).groupBy("lang").count()
    counts = {r.lang: r["count"] for r in out.collect()}
    assert counts["en"] == 1000  # rate 1.0 keeps everything
    assert 120 <= counts["de"] <= 280


def test_mixture_replication_and_epochs(spark):
    from pond_spark.operators.sampling import mixture

    rows = [(i, f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture(df, {"src0": 3.0, "src1": 0.5, "src2": 1.0}).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.epoch)
    # integer weight: every src0 row appears exactly 3x, epochs 0,1,2
    assert len(by_src["src0"]) == 300
    assert sorted(set(by_src["src0"])) == [0, 1, 2]
    # fractional: src1 thinned to ~half, single epoch
    assert 25 <= len(by_src["src1"]) <= 75 and set(by_src["src1"]) == {0}
    assert len(by_src["src2"]) == 100
    # unlisted source dropped entirely
    assert "src3" not in by_src


def test_pack_shards_matches_naive_window(spark):
    from pond_spark.operators.packing import pack_shards

    rows = [(i, 10 + (i * 37) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # small bucket_width → many buckets → two-level path exercised
    got = {
        r.doc_id: (r.token_offset, r.shard)
        for r in pack_shards(df, budget=1000, bucket_width=50).collect()
    }
    run = 0
    for i, n in rows:
        assert got[i] == (run, run // 1000), f"doc {i}"
        run += n
    # shards are contiguous in doc order and ~budget-sized
    shards = [got[i][1] for i, _ in rows]
    assert shards == sorted(shards)
    assert shards[-1] == (run - rows[-1][1]) // 1000


def test_temperature_weights_and_mixture(spark):
    from pond_spark.operators.sampling import (
        temperature_mixture,
        temperature_weights,
    )

    counts = {"en": 400, "de": 100, "fr": 25}
    w = temperature_weights(counts, alpha=0.5)
    assert w["fr"] == 1.0  # smallest stratum keeps everything
    assert abs(w["en"] - (400 / 25) ** -0.5) < 1e-12  # = 0.25
    assert w["fr"] > w["de"] > w["en"]
    # alpha=1 -> proportional sampling == keep everything
    assert all(v == 1.0 for v in temperature_weights(counts, 1.0).values())
    # alpha=0 -> uniform: every stratum downsamples to the smallest
    w0 = temperature_weights(counts, 0.0)
    assert abs(w0["en"] - 25 / 400) < 1e-12

    rows = [(i, "en" if i < 400 else ("de" if i < 500 else "fr"))
            for i in range(525)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mixture(df, alpha=0.0, source_col="lang")
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    # uniform temperature: strata land near the smallest stratum size
    assert got["fr"] == 25
    assert 10 <= got["en"] <= 45 and 10 <= got["de"] <= 45
    # deterministic
    assert out.count() == temperature_mixture(
        df, alpha=0.0, source_col="lang"
    ).count()


def test_salts_sharing_prefix_give_independent_samples(spark):
    """Regression (r4 review): the salt seed used only the first 8
    UTF-8 bytes, so 'experiment1' and 'experiment2' produced the SAME
    sample. Long salts must now select differently."""
    from pond_spark.operators.sampling import sample

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in sample(df, 0.3, salt="experiment1").collect()}
    b = {r.doc_id for r in sample(df, 0.3, salt="experiment2").collect()}
    assert a != b
    overlap = len(a & b) / max(1, len(a))
    assert 0.05 < overlap < 0.6  # independent-ish, not identical


def test_temperature_mixture_tolerates_null_sources(spark):
    """Regression (r4 review): a NULL source row crashed the driver
    (sorted() over a dict with a None key); it must instead get weight
    0 — dropped, like any unlisted source."""
    from pond_spark.operators.sampling import temperature_mixture

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else None) for i in range(40)],
        "doc_id long, source string",
    )
    out = temperature_mixture(df, alpha=0.5).collect()
    assert all(r.source == "a" for r in out)
    assert len(out) == 20  # the single stratum keeps everything


# -- reproducible shuffle / shard split (operators/packing.py) ----------


def test_reproducible_shuffle_is_a_permutation(spark):
    from pond_spark.operators.packing import reproducible_shuffle

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    out = reproducible_shuffle(docs, n_shards=8, seed=3).collect()
    assert len(out) == 200
    # every doc appears once; shard positions are contiguous 0..n-1
    assert len({r.doc_id for r in out}) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # determinism + seed sensitivity
    again = reproducible_shuffle(docs, n_shards=8, seed=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = reproducible_shuffle(docs, n_shards=8, seed=4).collect()
    order_a = [r.doc_id for r in sorted(out, key=lambda r: (r.shard, r.pos))]
    order_b = [r.doc_id for r in sorted(other, key=lambda r: (r.shard, r.pos))]
    assert order_a != order_b


def test_reproducible_shuffle_no_global_window(spark):
    """The in-shard rank must be a PARTITIONED window — a plan with a
    SinglePartition exchange would serialize the corpus into one task
    (the scale-killer pack_shards' two-level design exists to avoid)."""
    from pond_spark.operators.packing import reproducible_shuffle
    from pond_spark.plans import formatted_plan

    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    plan = formatted_plan(reproducible_shuffle(docs, n_shards=16))
    assert "SinglePartition" not in plan, plan


# ---------------------------------------------------------------------------
# sequence packing (FFD, no splitting) — operators/seqpack.py


def _ffd_reference(items, cap):
    """Independent pure-python FFD: (id, sz) -> {id: bin}."""
    fills, asg = [], {}
    for i, sz in sorted(items, key=lambda x: (-x[1], x[0])):
        for j, f in enumerate(fills):
            if f + sz <= cap:
                fills[j] += sz
                asg[i] = j
                break
        else:
            asg[i] = len(fills)
            fills.append(sz)
    return asg


def test_pack_sequences_matches_ffd_reference(spark):
    """Fuzz: the distributed operator equals per-bucket FFD exactly,
    across random size distributions including oversize docs."""
    import random

    from pond_spark.operators.seqpack import pack_sequences

    for seed, cap, n_buckets in [(1, 64, 4), (2, 128, 7), (3, 50, 1)]:
        rng = random.Random(seed)
        # sizes straddle the capacity so oversize singleton bins occur
        items = [(i, rng.randint(0, int(cap * 1.3))) for i in range(400)]
        df = spark.createDataFrame(items, "doc_id long, n_tokens long")
        got = {
            r.doc_id: (r.bucket, r.bin, r.n_tokens)
            for r in pack_sequences(df, cap, n_buckets=n_buckets).collect()
        }
        assert len(got) == len(items)  # every doc assigned exactly once
        for b in range(n_buckets):
            sub = [(i, sz) for i, sz in items if i % n_buckets == b]
            asg = _ffd_reference(sub, cap)
            for i, sz in sub:
                assert got[i] == (b, asg[i], sz), (seed, i)


def test_pack_sequences_capacity_invariant(spark):
    """No bin exceeds capacity unless it is an oversize singleton, and
    bucket-local bin ids are dense from 0."""
    import random

    from pond_spark.operators.seqpack import pack_sequences

    rng = random.Random(11)
    items = [(i, rng.randint(1, 90)) for i in range(500)]
    df = spark.createDataFrame(items, "doc_id long, n_tokens long")
    rows = pack_sequences(df, 64, n_buckets=8).collect()
    per_bin: dict = {}
    for r in rows:
        per_bin.setdefault((r.bucket, r.bin), []).append(r.n_tokens)
    for (_b, _j), szs in per_bin.items():
        if sum(szs) > 64:
            assert len(szs) == 1 and szs[0] > 64  # oversize singleton
    bins_by_bucket: dict = {}
    for b, j in per_bin:
        bins_by_bucket.setdefault(b, set()).add(j)
    for b, bins in bins_by_bucket.items():
        assert bins == set(range(len(bins)))


def test_pack_sequences_sql_twin_equivalence(spark):
    """The DuckDB recursive-CTE replay produces the identical per-bin
    rollup as the Spark operator on a random corpus."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from pond_spark.functions.text import token_count, token_count_sql
    from pond_spark.operators.seqpack import pack_sequences, pack_sequences_sql

    rng = random.Random(23)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(1, 40)))) for i in range(300)
    ]
    cap, n_buckets = 64, 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(
        df.select("doc_id", token_count(F.col("text"))), cap, n_buckets=n_buckets
    )
    got = sorted(
        (r.bucket, r.bin, r.n_docs, r.fill_tokens, r.waste, r.first_doc)
        for r in packed.groupBy("bucket", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("fill_tokens"),
            (F.lit(cap) - F.sum("n_tokens")).alias("waste"),
            F.min("doc_id").alias("first_doc"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    sql = pack_sequences_sql(cap, token_count_sql("text"), n_buckets=n_buckets)
    exp = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == exp


def test_sample_sql_twin_handles_negative_ids(spark):
    """Regression (r6 review): DuckDB's % is sign-preserving, so a
    negative id got a negative bucket and passed `bucket < threshold`
    at ANY rate — sample_sql now replays the Spark pmod exactly, and
    quoted stratum values escape safely."""
    import duckdb

    from pond_spark.operators.sampling import (
        sample,
        sample_sql,
        stratified_sample_sql,
    )

    ids = list(range(-500, 500))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(range(-500, 500)) AS doc_id"
    )
    for rate in (0.0, 0.25, 1.0):
        kept_spark = {r.doc_id for r in sample(df, rate).collect()}
        kept_sql = {
            r[0]
            for r in con.sql(
                f"SELECT doc_id FROM t WHERE {sample_sql(rate)}"
            ).fetchall()
        }
        assert kept_spark == kept_sql, rate
    assert not {
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM t WHERE " + sample_sql(0.0)
        ).fetchall()
    }  # rate 0 keeps NOTHING, negative ids included
    # quote-safety: a stratum value with an apostrophe parses fine
    con.execute("CREATE TABLE s AS SELECT unnest(range(100)) AS doc_id, "
                "CASE WHEN doc_id % 2 = 0 THEN 'it''s' ELSE 'b' END AS lang")
    n = con.sql(
        "SELECT count(*) FROM s WHERE "
        + stratified_sample_sql({"it's": 1.0, "b": 0.0})
    ).fetchall()[0][0]
    assert n == 50


def test_pack_sequences_twin_fuzz_randomized(spark):
    """r6 ask #6: fuzz the FFD twin equivalence the way the filters
    are fuzzed — randomized (sizes, capacity, n_buckets) across 100+
    cases. Every case checks the DuckDB recursive-CTE replay against
    a pure-Python first-fit-decreasing reference (the ground truth for
    the fold), and a stratified subset re-checks the Spark operator
    three-way (the Spark side is one applyInPandas job per case, so
    running all 100 through Spark would dominate suite time without
    adding coverage — the Python reference IS the numpy loop's
    semantics)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from pond_spark.functions.text import token_count, token_count_sql
    from pond_spark.operators.seqpack import pack_sequences, pack_sequences_sql

    rng = random.Random(712)

    def python_ffd(rows, cap, n_buckets):
        """(bucket, bin, n_docs, fill_tokens, waste, first_doc) rows."""
        out = []
        for b in range(n_buckets):
            items = sorted(
                ((sz, i) for i, sz in rows if i % n_buckets == b),
                key=lambda t: (-t[0], t[1]),
            )
            fills: list[int] = []
            asg: list[tuple[int, int, int]] = []
            for sz, i in items:
                for j, f in enumerate(fills):
                    if f + sz <= cap:
                        fills[j] += sz
                        asg.append((i, j, sz))
                        break
                else:
                    fills.append(sz)
                    asg.append((i, len(fills) - 1, sz))
            bins: dict[int, list[tuple[int, int]]] = {}
            for i, j, sz in asg:
                bins.setdefault(j, []).append((i, sz))
            for j, members in bins.items():
                tot = sum(sz for _i, sz in members)
                out.append(
                    (b, j, len(members), tot, cap - tot, min(i for i, _ in members))
                )
        return sorted(out)

    con = duckdb.connect()
    n_spark_checked = 0
    for case in range(110):
        n_docs = rng.randint(1, 60)
        max_sz = rng.randint(1, 50)
        cap = rng.randint(max_sz, 4 * max_sz)  # every doc must fit
        n_buckets = rng.choice([1, 2, 3, 4, 8])
        rows = [(i, rng.randint(1, max_sz)) for i in range(n_docs)]
        texts = [(i, " ".join("w" for _ in range(sz))) for i, sz in rows]
        exp = python_ffd(rows, cap, n_buckets)

        con.execute("DROP TABLE IF EXISTS documents")
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in texts)
            + ") AS t(doc_id, text)"
        )
        sql = pack_sequences_sql(cap, token_count_sql("text"), n_buckets=n_buckets)
        got_sql = sorted(map(tuple, con.sql(sql).fetchall()))
        assert got_sql == exp, (case, cap, n_buckets, rows)

        if case % 8 == 0:  # three-way: Spark operator on every 8th case
            df = spark.createDataFrame(texts, "doc_id long, text string")
            packed = pack_sequences(
                df.select("doc_id", token_count(F.col("text"))),
                cap,
                n_buckets=n_buckets,
            )
            got_spark = sorted(
                (r.bucket, r.bin, r.n_docs, r.fill_tokens, r.waste, r.first_doc)
                for r in packed.groupBy("bucket", "bin")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("fill_tokens"),
                    (F.lit(cap) - F.sum("n_tokens")).alias("waste"),
                    F.min("doc_id").alias("first_doc"),
                )
                .collect()
            )
            assert got_spark == exp, (case, cap, n_buckets, rows)
            n_spark_checked += 1
    assert n_spark_checked >= 14
