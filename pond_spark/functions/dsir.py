"""DSIR-style data selection: importance weights from hashed n-gram
bucket likelihood ratios (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — the standard recipe for
picking pretraining data that *looks like* a target corpus).

Beyond the reference surface (pond has no corpus selection); the
data-curation sibling of functions/nbayes.py — the same count/
smooth/log-ratio machinery, but corpus-level (target vs raw) over
HASHED feature buckets instead of class-conditional over words, so
the statistics table is fixed-size (``n_buckets`` rows) no matter how
large the vocabulary grows.

Shape, end to end:

- **featurize**: explode tokens, map each word to
  ``fingerprint(word) % n_buckets`` — the engine's cross-engine
  polynomial hash (functions/text.py), so the DuckDB oracle computes
  the identical bucket ids.
- **bucket stats**: ONE corpus-wide (doc, bucket) count aggregation;
  raw totals, target totals and the corpus totals all derive from
  that frame (its shuffle is written once — ReuseExchange — and it
  is docs-x-buckets sized, not token-sized).
- **ratio table**: per-bucket Laplace-smoothed quantized log ratio
  ``ratio_q(f) = logq(n_t+1, t_total+B) - logq(n_r+1, r_total+B)`` —
  an ``n_buckets``-row frame, broadcast.
- **score**: per-(doc, bucket) counts joined against the broadcast
  ratio table; ``weight_q = sum(cnt * ratio_q)`` is an exact BIGINT.

At 100 TB: the widest shuffle is the (doc_id, bucket) groupBy
(ids+ints only, map-side combined); bucket statistics are bounded by
``n_buckets`` regardless of corpus size; the scoring join broadcasts.
No vocabulary-sized state anywhere — that is DSIR's whole point.

Numeric determinism: the two ``logq`` families inherit nbayes'
ACCEPTED-risk adjudication (PERF_NOTES codicil) and are covered by
the measured boundary-margin audit in
tests/test_quantization_margin.py::test_dsir_ratio_margins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# THE shared quantized-log definition (floor(ln(num/den) * 1e6)) —
# one implementation so the adjudicated determinism contract cannot
# drift between the classifier and the selector
from pond_spark.functions.nbayes import _logq
from pond_spark.functions.text import _words, fingerprint


def dsir_weights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Per-doc importance weight of raw docs toward the ``target``
    slice: ``(doc_id, n_tokens, weight_q)`` — integer columns,
    ``weight_q`` the quantized log-likelihood ratio sum."""
    w = docs.select(
        F.col(id_col),
        target.alias("_t"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).select(
        F.col(id_col),
        "_t",
        F.pmod(fingerprint(F.col("word")), F.lit(n_buckets)).alias("bucket"),
    )

    # ONE corpus-wide aggregation — everything downstream derives from
    # this (docs x buckets)-sized frame, so the exploded corpus is
    # scanned once, not once per statistic. Pinned because four
    # consumers branch off it (the repo's multi-branch reuse rule);
    # it is the REDUCED frame, never the token stream. localCheckpoint
    # instead of persist so the blocks are released when the returned
    # frame is dropped (ContextCleaner) rather than pinned in the cache
    # manager across queries in a long-lived session; the trade is the
    # standard localCheckpoint one (no lineage recompute on executor
    # loss), already accepted for pagerank's iterations.
    per_doc = (
        w.groupBy(id_col, "bucket", "_t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )

    raw = per_doc.groupBy("bucket").agg(F.sum("cnt").alias("n_r"))
    tgt = (
        per_doc.filter(F.col("_t"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("n_t"))
    )
    totals = per_doc.agg(
        F.sum("cnt").alias("r_total"),
        F.sum(F.when(F.col("_t"), F.col("cnt")).otherwise(0)).alias("t_total"),
    )

    ratio = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _logq(
                    F.coalesce(F.col("n_t"), F.lit(0)) + F.lit(1),
                    F.col("t_total") + F.lit(n_buckets),
                )
                - _logq(
                    F.col("n_r") + F.lit(1),
                    F.col("r_total") + F.lit(n_buckets),
                )
            ).alias("ratio_q"),
        )
    )

    return (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("ratio_q")).alias("weight_q"),
        )
    )


def dsir_topk(
    docs: DataFrame,
    target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic importance RESAMPLING head: the ``k`` raw docs
    most target-like — ``(doc_id, n_tokens, weight_q, rank)``, ties by
    id. (The paper samples with Gumbel noise; a seeded variant is a
    one-line ``weight_q + gumbel_q(seed, id)`` change — the
    deterministic head keeps the oracle exact.) Top-k compiles to
    TakeOrderedAndProject — no global sort at scale."""
    from pyspark.sql.window import Window

    weights = dsir_weights(docs, target, text_col, id_col, n_buckets)
    win = Window.orderBy(F.col("weight_q").desc(), F.col(id_col).asc())
    return (
        weights.orderBy(F.col("weight_q").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(win).cast("long"))
    )


def dsir_weights_sql(
    target_sql: str,
    n_buckets: int = 256,
    table: str = "documents",
) -> str:
    """DuckDB twin — identical tokenization, bucket hash, smoothing
    and quantization. ``target_sql`` is the predicate over ``table``
    columns (e.g. ``lang = 'en'``)."""
    from pond_spark.functions.text import HASH_BASE, HASH_MOD

    s = 1_000_000.0
    return f"""
WITH w AS (
  SELECT doc_id, t,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(word, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD}) % {n_buckets}
           AS bucket
  FROM (SELECT doc_id, ({target_sql}) AS t,
               unnest((CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END)) AS word
        FROM {table})),
raw AS (SELECT bucket, count(*) AS n_r FROM w GROUP BY bucket),
tgt AS (SELECT bucket, count(*) AS n_t FROM w WHERE t GROUP BY bucket),
totals AS (SELECT count(*) AS r_total,
                  sum(CASE WHEN t THEN 1 ELSE 0 END) AS t_total FROM w),
ratio AS (
  SELECT raw.bucket AS bucket,
         CAST(floor(ln(CAST(coalesce(tgt.n_t, 0) + 1 AS DOUBLE)
                       / (tt.t_total + {n_buckets})) * {s!r}) AS BIGINT)
       - CAST(floor(ln(CAST(raw.n_r + 1 AS DOUBLE)
                       / (tt.r_total + {n_buckets})) * {s!r}) AS BIGINT)
           AS ratio_q
  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN totals tt),
per_doc AS (SELECT doc_id, bucket, count(*) AS cnt FROM w
            GROUP BY doc_id, bucket)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(cnt * ratio_q) AS BIGINT) AS weight_q
FROM per_doc JOIN ratio USING (bucket)
GROUP BY doc_id
"""
