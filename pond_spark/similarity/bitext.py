"""Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
LASER/CCMatrix recipe): align two embedding collections (e.g. source-
and target-language sentence embeddings) by RATIO MARGIN rather than
raw cosine, which suppresses hub vectors that are everyone's nearest
neighbor.

    margin(x, y) = cos(x, y) / ((avg_kNN_cos(x) + avg_kNN_cos(y)) / 2)

Beyond the reference surface (pond has no embedding ops); deepens the
similarity family next to brute.knn_join / lsh / ivf.

Shape: forward (src -> tgt) and backward (tgt -> src) exact k-NN via
brute.knn_join (broadcast-guarded — this exact miner is for a
guard-bounded side; for large-vs-large, generate candidates with
lsh.embedding_near_pairs or ivf and feed them through the same margin
arithmetic), per-vector neighborhood sums, then a candidate-pair join
against two broadcastable per-id sum tables. Every post-kNN stage is
id-keyed.

Numeric determinism (PERF_NOTES rule): cosines arrive rounded to 6
decimals from the shared cosine_similarity; they are converted to
exact micro-unit BIGINTs (round(cos * 1e6)), neighborhood sums are
integer sums, and the margin is INTEGER division over the ACTUAL
neighbor counts per side (a vector can have fewer than k neighbors —
small slice, zero-norm rows dropped), matching Artetxe & Schwenk's
average-over-actual-neighborhood definition exactly:

    margin_bp = cq * 2 * cnt_s * cnt_t * 10000
                div (sum_s * cnt_t + sum_t * cnt_s)

which reduces to ``cq * 2k * 10000 div (sum_s + sum_t)`` when both
sides have full k neighborhoods. Restricted to positive operands —
no float crosses a row boundary, so grouping order cannot perturb
the hash."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: margin quantization: basis points (1.0 ratio == 10000)
MARGIN_SCALE = 10_000


def _micro(col):
    """Rounded-cosine -> exact integer micro-units."""
    return F.round(col * F.lit(1_000_000.0)).cast("long")


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold_bp: int = MARGIN_SCALE,
    vec_col: str = "embedding",
    src_id: str = "vec_id",
    tgt_id: str = "vec_id",
    dim: int | None = None,
    max_rows: int | None = None,
) -> DataFrame:
    """Mine aligned pairs: ``(src_id, tgt_id, cos_q, margin_bp)`` —
    the best target per source among forward/backward k-NN candidates
    with ratio margin >= threshold (in basis points), ties by target
    id. ``cos_q`` is the micro-unit cosine (integer)."""
    from pyspark.sql.window import Window

    from pond_spark.similarity.brute import cross_scores

    # cosine is symmetric, so the forward (src->tgt) and backward
    # (tgt->src) k-NN rank the SAME score matrix — score it once
    # (element-order-identical dot products, so values are bit-equal
    # to two knn_join passes) and pin the (ids, cosine) frame: it
    # feeds both direction windows plus the candidate union, and its
    # footprint is the O(n·m) the exact miner already is.
    # localCheckpoint instead of persist so the blocks are released
    # when the returned frame is dropped (ContextCleaner) rather than
    # pinned in the cache manager for the session's lifetime.
    kw = {}
    if max_rows is not None:
        kw["max_right_rows"] = max_rows
    sc = (
        cross_scores(src, tgt, vec_col, src_id, tgt_id, dim, **kw)
        .select(
            F.col("qid").alias("sid"),
            F.col("nid").alias("tid"),
            _micro(F.col("cosine")).alias("cos_q"),
        )
        .localCheckpoint(eager=False)
    )
    wf = Window.partitionBy("sid").orderBy(
        F.col("cos_q").desc(), F.col("tid").asc()
    )
    wb = Window.partitionBy("tid").orderBy(
        F.col("cos_q").desc(), F.col("sid").asc()
    )
    fq = (
        sc.withColumn("_rk", F.row_number().over(wf))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
    bq = (
        sc.withColumn("_rk", F.row_number().over(wb))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
    # candidate pairs: union of both directions (cosine is symmetric,
    # so the distinct collapses duplicates exactly)
    cand = fq.unionByName(bq).distinct()

    sum_s = fq.groupBy("sid").agg(
        F.sum("cos_q").alias("sum_s"), F.count(F.lit(1)).alias("cnt_s")
    )
    sum_t = bq.groupBy("tid").agg(
        F.sum("cos_q").alias("sum_t"), F.count(F.lit(1)).alias("cnt_t")
    )

    scored = (
        cand.join(F.broadcast(sum_s), "sid")
        .join(F.broadcast(sum_t), "tid")
        # positive-operand restriction keeps integer `div` == floor
        # division in every engine (and a non-positive neighborhood
        # sum means the pair is junk anyway)
        .filter(
            (F.col("cos_q") > 0)
            & (F.col("sum_s") * F.col("cnt_t")
               + F.col("sum_t") * F.col("cnt_s") > 0)
        )
        .select(
            "sid",
            "tid",
            "cos_q",
            F.expr(
                f"cos_q * {2 * MARGIN_SCALE} * cnt_s * cnt_t"
                " div (sum_s * cnt_t + sum_t * cnt_s)"
            ).alias("margin_bp"),
        )
        .filter(F.col("margin_bp") >= margin_threshold_bp)
    )
    w = Window.partitionBy("sid").orderBy(
        F.col("margin_bp").desc(), F.col("tid").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def bitext_mine_sql(
    src_where: str,
    tgt_where: str,
    cos_sql: str,
    k: int = 4,
    margin_threshold_bp: int = MARGIN_SCALE,
    table: str = "embeddings",
) -> str:
    """DuckDB twin — brute-force both k-NN directions, identical
    micro-unit conversion, integer sums and floor division.
    ``cos_sql`` is the engine's shared rounded-cosine expression over
    aliases ``l``(qv)/``r``(nv)."""
    knn = f"""
    SELECT * FROM (
      SELECT qid, nid, CAST(round(cosine * 1000000.0) AS BIGINT) AS cos_q,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, nid ASC) AS rn
      FROM scored_{{d}}) WHERE rn <= {k}"""
    return f"""
WITH s AS (SELECT vec_id, embedding FROM {table} WHERE {src_where}),
t AS (SELECT vec_id, embedding FROM {table} WHERE {tgt_where}),
scored_f AS (SELECT l.vec_id AS qid, r.vec_id AS nid, {cos_sql} AS cosine
             FROM (SELECT vec_id, embedding AS qv FROM s) l
             CROSS JOIN (SELECT vec_id, embedding AS nv FROM t) r
             WHERE {cos_sql} IS NOT NULL),
scored_b AS (SELECT l.vec_id AS qid, r.vec_id AS nid, {cos_sql} AS cosine
             FROM (SELECT vec_id, embedding AS qv FROM t) l
             CROSS JOIN (SELECT vec_id, embedding AS nv FROM s) r
             WHERE {cos_sql} IS NOT NULL),
fq AS (SELECT qid AS sid, nid AS tid, cos_q FROM ({knn.format(d="f")})),
bq AS (SELECT nid AS sid, qid AS tid, cos_q FROM ({knn.format(d="b")})),
cand AS (SELECT DISTINCT sid, tid, cos_q FROM (
           SELECT * FROM fq UNION ALL SELECT * FROM bq)),
sum_s AS (SELECT sid, CAST(sum(cos_q) AS BIGINT) AS sum_s,
                 CAST(count(*) AS BIGINT) AS cnt_s FROM fq GROUP BY sid),
sum_t AS (SELECT tid, CAST(sum(cos_q) AS BIGINT) AS sum_t,
                 CAST(count(*) AS BIGINT) AS cnt_t FROM bq GROUP BY tid),
scored AS (
  SELECT sid, tid, cos_q,
         cos_q * {2 * MARGIN_SCALE} * cnt_s * cnt_t
           // (sum_s * cnt_t + sum_t * cnt_s) AS margin_bp
  FROM cand JOIN sum_s USING (sid) JOIN sum_t USING (tid)
  WHERE cos_q > 0 AND sum_s * cnt_t + sum_t * cnt_s > 0),
kept AS (SELECT sid, tid, cos_q, CAST(margin_bp AS BIGINT) AS margin_bp,
                row_number() OVER (PARTITION BY sid
                                   ORDER BY margin_bp DESC, tid ASC) AS rk
         FROM scored WHERE margin_bp >= {margin_threshold_bp})
SELECT sid, tid, cos_q, margin_bp FROM kept WHERE rk = 1
"""
