"""Mergeable distinct-count sketch tables — precomputed HyperLogLog
cubes (Apache DataSketches HLL, built into Spark 3.5+ as
``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB pattern this unlocks: plain distinct counts are NOT
mergeable — a per-day uniques table cannot answer "uniques this week"
without rescanning the raw events, because summing daily uniques
over-counts returning visitors. A per-day HLL *sketch* table is
mergeable: any date range collapses to a union of fixed-size (KB)
sketches — the raw 100 TB event store is touched exactly once at
build time, and every later range query reads only the tiny sketch
partitions it covers (partition-pruned, plan-asserted in tests).

This is the materialized twin of q_daily_uniques_approx's inline
``approx_count_distinct`` (same sketch family, persisted instead of
recomputed), and the distinct-count sibling of the rollup family
(operators/rollup.py) whose additive measures pre-aggregate with
plain sums.

Accuracy: DataSketches HLL at lg_k=12 has ~1.6% relative standard
error; estimates are engine-specific, so oracle rows follow the
established accuracy-envelope pattern (emit exact + within-bound
flag; see __spark_entry__.q_daily_uniques_approx).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "build_uniques_sketches",
    "update_uniques_sketches",
    "uniques_over_range",
    "build_value_sketches",
    "update_value_sketches",
    "value_quantiles_over_range",
    "build_cm_sketches",
    "update_cm_sketches",
    "cm_estimate_over_range",
]


def _overwrite_day_partitions(
    spark: SparkSession, merged: DataFrame, path: str
) -> None:
    """Dynamic-partition-overwrite write shared by the three sketch
    updaters (only the touched day directories are rewritten); the
    conf toggle is scoped save/restore."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def build_uniques_sketches(
    logs: DataFrame,
    path: str,
    value_col: str = "remote_host",
    site_col: str = "site",
    ts_col: str = "timestamp",
    lg_k: int = 12,
) -> None:
    """One pass over the events: per (day, site) HLL sketch, written
    ``partitionBy(day)`` (ISO date strings, so range predicates prune
    directories). The sketch column is the DataSketches binary —
    ~KBs per group at lg_k=12 regardless of cardinality."""
    daily = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(site_col).alias("site"),
        )
        .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"))
    )
    (
        daily.repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def update_uniques_sketches(
    logs: DataFrame,
    path: str,
    value_col: str = "remote_host",
    site_col: str = "site",
    ts_col: str = "timestamp",
    lg_k: int = 12,
) -> None:
    """Incremental maintenance: fold a NEW batch of events into the
    cube without rebuilding. The batch's per-(day, site) sketches are
    unioned with the existing sketches of exactly the days the batch
    touches, and only those day partitions are rewritten (dynamic
    partition overwrite — untouched days' directories are never read
    or written). Sketch union is exactly how HLL absorbs new members,
    so the result equals a full rebuild over old+new (asserted in
    tests). Single-writer, like every mutable layout here
    (DigestCatalog, TextIndex)."""
    spark = logs.sparkSession
    batch = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(site_col).alias("site"),
        )
        .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"))
    )
    # persist: the batch aggregation feeds BOTH the days collect and
    # the merged write — without the pin the full groupBy over the new
    # events runs twice (r6 review finding; same in the CM and
    # bottom-k updaters)
    batch = batch.persist()
    try:
        days = [r.day for r in batch.select("day").distinct().collect()]
        if not days:
            return
        existing = spark.read.parquet(path).filter(F.col("day").isin(days))
        merged = (
            batch.unionByName(existing)
            .groupBy("day", "site")
            .agg(
                F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch")
            )
        )
        _overwrite_day_partitions(spark, merged, path)
    finally:
        batch.unpersist()


def uniques_over_range(
    spark: SparkSession,
    path: str,
    start_day: str,
    end_day: str,
    by_site: bool = True,
) -> DataFrame:
    """Estimated uniques over ``[start_day, end_day]`` (inclusive ISO
    dates) from the sketch table alone — no raw-event scan. The day
    filter is a partition filter on the sketch directories; the union
    is one tiny groupBy over KB-sized sketches."""
    sk = spark.read.parquet(path).filter(
        (F.col("day") >= start_day) & (F.col("day") <= end_day)
    )
    merged = (
        sk.groupBy("site") if by_site else sk.groupBy(F.lit(1).alias("_g"))
    ).agg(F.hll_union_agg(F.col("sketch")).alias("_u"))
    out = merged.select(
        *(["site"] if by_site else []),
        F.hll_sketch_estimate(F.col("_u")).alias("uniques_est"),
    )
    return out


# ---------------------------------------------------------------------------
# mergeable QUANTILE sketches: deterministic bottom-k value samples

#: affine hash constants for the sample membership key — the same
#: cross-engine-portable arithmetic family as
#: operators/packing.reproducible_shuffle and functions/text.fingerprint
BK_A = 48_271
BK_C = 2_654_435_761
BK_MOD = 1_000_000_007


def _bk_key(id_col: str, seed: int) -> F.Column:
    return F.pmod(
        F.col(id_col) * F.lit(BK_A) + F.lit(seed) * F.lit(BK_C),
        F.lit(BK_MOD),
    )


def quantile_col_names(quantiles) -> list[str]:
    """Stable, collision-free output names for quantile columns: the
    quantile's decimal digits verbatim — q50 for 0.5, q90 for 0.9,
    q999 for 0.999, q05 for 0.05, q100 for 1.0. The previous
    ``round(q*100)`` rule mapped (0.999, 1.0) both to 'q100'
    (duplicate StructFields in the stream's state schema) and
    banker's-rounded 0.125 to 'q12' (ADVICE r7). Shared by the batch
    serve (value_quantiles_over_range) and the live twin
    (streaming/quantiles.py) so their output schemas stay EQUAL."""
    names = []
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile out of range (0, 1]: {q}")
        if q == 1.0:
            names.append("q100")
            continue
        frac = f"{q:.10g}".split(".")[1]
        if len(frac) == 1:
            frac += "0"  # back-compat: 0.5 stays q50, not q5
        names.append(f"q{frac}")
    if len(set(names)) != len(names):
        raise ValueError(f"quantile column names collide: {names}")
    return names


def _check_bk_params(
    spark: SparkSession,
    path: str,
    k: int,
    seed: int | None,
    serve: bool = False,
    kind: str = "value sketch",
) -> None:
    """Validate bottom-k parameters against the table's sidecar. The
    merge identity ``bottom_k(A∪B) = bottom_k(bottom_k(A)∪bottom_k(B))``
    only holds when the merge k does not EXCEED the per-day k the
    table was built with — a larger serve-time k silently returns a
    non-uniform sample and biased quantiles (r6 review finding).
    Updates must match exactly (mixed-k day partitions would poison
    later merges). Tables written before the sidecar existed validate
    against nothing (best-effort compatibility). Shared by the value
    sketches here and the KMV/theta sketches (operators/kmv.py) —
    ``kind`` labels the error.

    Sidecar I/O goes through catalog._fs_for, never builtin open():
    the parquet table itself supports hdfs://-style paths, so the
    sidecar must too, or remote tables silently skip validation
    (ADVICE r7)."""
    import json

    from pond_spark.catalog import _fs_for

    fs = _fs_for(spark, path)
    sidecar = path + ".params.json"
    if not fs.exists(sidecar):
        return
    stored = json.loads(fs.read_text(sidecar))
    if seed is not None and stored.get("seed") != seed:
        raise ValueError(
            f"{kind} table at {path} was built with seed="
            f"{stored.get('seed')}, used with seed={seed} — sample "
            "membership keys are incomparable"
        )
    if serve:
        if k > stored.get("k", k):
            raise ValueError(
                f"{kind} table at {path} holds bottom-{stored['k']} "
                f"per day; serving k={k} would exceed it and bias the "
                "merged sample (merge identity needs k <= build k)"
            )
    elif stored.get("k") != k:
        raise ValueError(
            f"{kind} table at {path} was built with k={stored['k']}; "
            f"updating with k={k} would mix sample sizes across days"
        )


def _write_bk_params(spark: SparkSession, path: str, k: int, seed: int) -> None:
    import json

    from pond_spark.catalog import _fs_for

    _fs_for(spark, path).write_text(
        path + ".params.json", json.dumps({"k": int(k), "seed": int(seed)})
    )


#: CM hash-family version: 2 = per-row MULTIPLIERS (cm_row_mult, the
#: r6 fix); 1 = the pre-r6 per-row additive offsets. Cells from the
#: two families land in different columns, so merging them corrupts
#: counts and can break CM's never-underestimate guarantee — tables
#: are stamped and update/serve refuse on mismatch (ADVICE r6).
CM_HASH_VERSION = 2


def _write_cm_params(
    spark: SparkSession, path: str, depth: int, width: int
) -> None:
    import json

    from pond_spark.catalog import _fs_for

    _fs_for(spark, path).write_text(
        path + ".params.json",
        json.dumps(
            {
                "hash_version": CM_HASH_VERSION,
                "depth": int(depth),
                "width": int(width),
            }
        ),
    )


def _check_cm_params(
    spark: SparkSession,
    path: str,
    depth: int | None = None,
    width: int | None = None,
) -> None:
    """Refuse to update or serve a CM table whose sidecar disagrees on
    hash family, depth or width — cell indices are a function of all
    three, so a mismatch silently mixes incompatible grids (merged
    cells land in wrong columns; the min-over-rows estimate can fall
    BELOW the true count). Tables written before the sidecar existed
    (both hash families, indistinguishable) validate against nothing —
    best-effort, like the bottom-k sidecar. Sidecar I/O through
    catalog._fs_for so hdfs://-style tables validate too (ADVICE r7)."""
    import json

    from pond_spark.catalog import _fs_for

    fs = _fs_for(spark, path)
    sidecar = path + ".params.json"
    if not fs.exists(sidecar):
        return
    stored = json.loads(fs.read_text(sidecar))
    if stored.get("hash_version", CM_HASH_VERSION) != CM_HASH_VERSION:
        raise ValueError(
            f"CM table at {path} was built with hash_version="
            f"{stored.get('hash_version')} (this build is "
            f"{CM_HASH_VERSION}) — rebuild the table; mixing families "
            "corrupts cells"
        )
    for name, got in (("depth", depth), ("width", width)):
        if got is not None and stored.get(name, got) != got:
            raise ValueError(
                f"CM table at {path} was built with {name}="
                f"{stored.get(name)}, used with {name}={got} — cell "
                "indices are incompatible"
            )


def build_value_sketches(
    logs: DataFrame,
    path: str,
    k: int = 64,
    value_col: str = "value",
    id_col: str = "id",
    site_col: str = "site",
    ts_col: str = "timestamp",
    seed: int = 1,
) -> None:
    """Per-(day, site) bottom-k VALUE sample — the quantile sibling of
    the HLL cube above, built on the classic mergeable bottom-k
    sketch: keep the k rows whose hash key is smallest. Because
    ``bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪ bottom_k(B))``, any
    date range later collapses to a union of the per-day samples and
    one more bottom-k — the raw store is scanned exactly once, here.

    Spark has no mergeable quantile-sketch aggregate (HLL landed in
    3.5; KLL did not), so this IS the engine's scale path for
    persisted percentile rollups. Unlike KLL/t-digest, the sample
    membership is a PURE function of (id, seed) — deterministic
    across engines, so oracle twins replay it exactly instead of
    settling for an accuracy envelope. Error is the uniform-sampling
    bound O(1/sqrt(k)) on rank, ~12% rank error at k=64; raise k for
    tighter tails (cost is linear in k per group).
    """
    ranked = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(site_col).alias("site"),
            F.col(value_col).alias("value"),
            _bk_key(id_col, seed).alias("bk"),
            F.col(id_col).alias("rid"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("day", "site").orderBy("bk", "rid")
    sample = ranked.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    ).drop("_rn")
    (
        sample.repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    _write_bk_params(logs.sparkSession, path, k, seed)


def value_quantiles_over_range(
    spark: SparkSession,
    path: str,
    start_day: str,
    end_day: str,
    k: int = 64,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Per-site quantile estimates over ``[start_day, end_day]`` from
    the sample table alone — no raw-event scan. Merge = take the k
    smallest hash keys per site across the covered days, then select
    EXACT-RANK elements (position ``ceil(q*m)`` of the sample ordered
    by value): the output values are untouched input doubles — no
    interpolation arithmetic — so they hash identically everywhere
    (PERF_NOTES rule: raw pass-through floats are safe; computed ones
    are not). Returns ``(site, n_sample, q50, q90, ...)``.

    ``k`` must not exceed the table's build-time k (validated against
    the params sidecar) — the merge identity breaks upward."""
    from pyspark.sql.window import Window

    _check_bk_params(spark, path, k, seed=None, serve=True)
    sk = spark.read.parquet(path).filter(
        (F.col("day") >= start_day) & (F.col("day") <= end_day)
    )
    wk = Window.partitionBy("site").orderBy("bk", "rid")
    merged = sk.withColumn("_rn", F.row_number().over(wk)).filter(
        F.col("_rn") <= k
    )
    wv = Window.partitionBy("site").orderBy("value", "rid")
    sized = (
        merged.withColumn("_vr", F.row_number().over(wv))
        .withColumn("_m", F.count(F.lit(1)).over(Window.partitionBy("site")))
    )
    picks = [
        F.max(
            F.when(
                F.col("_vr") == F.ceil(F.lit(q) * F.col("_m")), F.col("value")
            )
        ).alias(name)
        for q, name in zip(quantiles, quantile_col_names(quantiles))
    ]
    return sized.groupBy("site").agg(
        F.max("_m").cast("long").alias("n_sample"), *picks
    )


# ---------------------------------------------------------------------------
# mergeable COUNT-MIN sketches: fixed-size frequency cells per day

#: Count-Min geometry defaults: depth×width cells per day partition.
#: ε = e/width (overestimate bound as a fraction of total count),
#: δ = e^-depth (probability the bound is exceeded) — Cormode &
#: Muthukrishnan 2005. 4×1024 int64 cells = 32 KB per day regardless
#: of key cardinality.
CM_DEPTH = 4
CM_WIDTH = 1024


def cm_row_mult(row: int) -> int:
    """Row-``row`` MULTIPLIER: ``BK_A^(row+1) mod p``. The rows must
    differ in the multiplier, not just an additive offset — with a
    shared multiplier a key pair colliding in one row collides in
    (nearly) every row (the hash differences are identical), so the
    min-over-depth gives no protection and the documented
    ``δ = e^-depth`` bound silently fails (r6 review finding).
    Distinct multipliers make the per-row collision events
    (pairwise) independent in the affine family."""
    return pow(BK_A, row + 1, BK_MOD)


def _cm_col(keyhash: Column, row: int, width: int) -> Column:
    """Row-``row`` cell index for a (portable-hashed) long key —
    ``((kh * A_row + C) mod p) mod width`` with a per-row multiplier
    (see cm_row_mult)."""
    return F.pmod(
        F.pmod(
            keyhash * F.lit(cm_row_mult(row)) + F.lit(BK_C),
            F.lit(BK_MOD),
        ),
        F.lit(width),
    )


def build_cm_sketches(
    logs: DataFrame,
    path: str,
    key_col: str = "message",
    ts_col: str = "timestamp",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> None:
    """Per-day Count-Min frequency sketch over a string key — the
    point-frequency sibling of the HLL (distinct) and bottom-k
    (quantile) cubes above: plain per-key counts at 100 TB produce a
    table as big as the key space, but CM cells are a FIXED
    ``depth×width`` grid per day, mergeable by cell-wise addition, so
    any date range answers "how often did key X appear" from KBs.

    The key is hashed with functions.text.fingerprint (the portable
    polynomial hash), so estimates replay exactly in the DuckDB twin —
    a hard hash-match oracle, not an accuracy envelope: the estimate
    is DETERMINISTIC; only its relation to the true count is
    probabilistic (est ≥ true always; est ≤ true + ε·N w.p. 1-δ)."""
    from pond_spark.functions.text import fingerprint

    keyed = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("kh", fingerprint(F.col("key")))
    )
    cells = (
        keyed.select(
            "day",
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            _cm_col(F.col("kh"), r, width).alias("col"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rc"),
        )
        .groupBy("day", F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    (
        cells.repartition("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    _write_cm_params(logs.sparkSession, path, depth, width)


def update_cm_sketches(
    logs: DataFrame,
    path: str,
    key_col: str = "message",
    ts_col: str = "timestamp",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> None:
    """Incremental maintenance (update_uniques_sketches twin): CM
    merge is cell-wise ADDITION, so folding a new batch = add its
    day-cells to the existing cells of exactly the touched days and
    rewrite only those partitions. Equal to a full rebuild over
    old+new (asserted in tests); single-writer like every mutable
    layout here."""
    from pond_spark.functions.text import fingerprint

    spark = logs.sparkSession
    _check_cm_params(spark, path, depth, width)
    keyed = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("kh", fingerprint(F.col("key")))
    )
    batch = (
        keyed.select(
            "day",
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            _cm_col(F.col("kh"), r, width).alias("col"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rc"),
        )
        .groupBy("day", F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    batch = batch.persist()  # feeds the days collect AND the write
    try:
        days = [r.day for r in batch.select("day").distinct().collect()]
        if not days:
            return
        existing = spark.read.parquet(path).filter(
            F.col("day").isin(days)
        ).select("day", "row", "col", "cnt")
        merged = (
            batch.unionByName(existing)
            .groupBy("day", "row", "col")
            .agg(F.sum("cnt").alias("cnt"))
        )
        _overwrite_day_partitions(spark, merged, path)
    finally:
        batch.unpersist()


def cm_estimate_over_range(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    start_day: str,
    end_day: str,
    key_col: str = "key",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Estimated frequency of each candidate key over
    ``[start_day, end_day]`` from the sketch table alone — day filter
    prunes partitions, cells merge by summation into one
    ``depth×width`` grid (KBs), and each key's estimate is the MIN
    over its ``depth`` cells — ``depth`` chained broadcast joins
    against the merged grid, zero shuffles on the key relation.
    Returns ``(key, est)``; est ≥ the true range count, always."""
    from pond_spark.functions.text import fingerprint

    _check_cm_params(spark, path, depth, width)
    cells = (
        spark.read.parquet(path)
        .filter((F.col("day") >= start_day) & (F.col("day") <= end_day))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    out = keys.select(
        F.col(key_col).alias("key"), fingerprint(F.col(key_col)).alias("_kh")
    )
    ests = []
    for r in range(depth):
        side = cells.filter(F.col("row") == r).select(
            F.col("col").alias(f"_c{r}"), F.col("cnt").alias(f"_n{r}")
        )
        out = out.withColumn(f"_p{r}", _cm_col(F.col("_kh"), r, width))
        out = out.join(
            F.broadcast(side), out[f"_p{r}"] == side[f"_c{r}"], "left"
        )
        ests.append(F.coalesce(F.col(f"_n{r}"), F.lit(0)))
    return out.select("key", F.least(*ests).cast("long").alias("est"))


def update_value_sketches(
    logs: DataFrame,
    path: str,
    k: int = 64,
    value_col: str = "value",
    id_col: str = "id",
    site_col: str = "site",
    ts_col: str = "timestamp",
    seed: int = 1,
) -> None:
    """Incremental maintenance, the update_uniques_sketches twin: fold
    a NEW batch into the sample table by unioning the batch's
    per-(day, site) bottom-k with the existing samples of exactly the
    touched days and re-taking bottom-k — equal to a full rebuild by
    the bottom-k merge identity (asserted in tests). Only touched day
    partitions rewrite (dynamic partition overwrite)."""
    from pyspark.sql.window import Window

    spark = logs.sparkSession
    batch = (
        logs.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(site_col).alias("site"),
            F.col(value_col).alias("value"),
            _bk_key(id_col, seed).alias("bk"),
            F.col(id_col).alias("rid"),
        )
    )
    _check_bk_params(spark, path, k, seed)
    batch = batch.persist()  # feeds the days collect AND the write
    try:
        days = [r.day for r in batch.select("day").distinct().collect()]
        if not days:
            return
        existing = spark.read.parquet(path).filter(
            F.col("day").isin(days)
        ).select("day", "site", "value", "bk", "rid")
        w = Window.partitionBy("day", "site").orderBy("bk", "rid")
        merged = (
            batch.unionByName(existing)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        _overwrite_day_partitions(spark, merged, path)
    finally:
        batch.unpersist()
