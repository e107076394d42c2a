"""Corpus drift report — distribution shift between two corpus slices
over hashed token buckets, the monitoring twin of DSIR
(functions/dsir.py): DSIR asks "how do I select data that looks like
the target", drift asks "how far has what I'm ingesting moved from
what I trained on". Production corpus pipelines run this per
snapshot/day to catch upstream changes (a crawler losing a locale, a
source flipping encodings) before they poison a training mix.

Same scale contract as DSIR: token buckets via the portable
polynomial hash mean the comparison table is a fixed ``n_buckets``
rows no matter the vocabulary; the only wide stage is one
(bucket)-keyed count aggregation with map-side combine. Rates are
integer parts-per-million (``cnt * 1e6 div total`` — the promo_bps
pattern), so the report hashes identically cross-engine; the movers
ranking sorts on an exact integer |delta|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _words, fingerprint

__all__ = ["corpus_drift", "corpus_drift_sql"]


def corpus_drift(
    docs: DataFrame,
    slice_a: Column,
    slice_b: Column,
    text_col: str = "text",
    n_buckets: int = 256,
    top: int = 30,
) -> DataFrame:
    """Top-``top`` token-bucket movers between slice A and slice B:
    ``(bucket, cnt_a, cnt_b, ppm_a, ppm_b, delta_ppm)`` ordered by
    |delta_ppm| desc (bucket asc ties). Rows not in either slice are
    ignored; a row matching both predicates counts in both (the
    predicates need not partition the corpus)."""
    toks = docs.select(
        slice_a.alias("_a"),
        slice_b.alias("_b"),
        F.explode(_words(F.col(text_col))).alias("word"),
    ).select(
        "_a",
        "_b",
        F.pmod(fingerprint(F.col("word")), F.lit(n_buckets)).alias("bucket"),
    )
    # persist (r11, guide §1.2): per_bucket feeds BOTH the totals and
    # the scored projection — without the pin the corpus explode +
    # token-hash pass ran twice (Spark has no cross-branch CSE). The
    # pinned frame is exactly n_buckets rows. Dropped by the loop
    # drivers' clearCache contract.
    per_bucket = (
        toks.filter(F.col("_a") | F.col("_b"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).alias("cnt_b"),
        )
        .persist()
    )
    tot = per_bucket.agg(
        F.sum("cnt_a").alias("_ta"), F.sum("cnt_b").alias("_tb")
    )
    scored = per_bucket.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "cnt_a",
        "cnt_b",
        F.expr("cnt_a * 1000000 div greatest(_ta, 1)").alias("ppm_a"),
        F.expr("cnt_b * 1000000 div greatest(_tb, 1)").alias("ppm_b"),
        F.expr(
            "cnt_a * 1000000 div greatest(_ta, 1) "
            "- cnt_b * 1000000 div greatest(_tb, 1)"
        ).alias("delta_ppm"),
    )
    return scored.orderBy(
        F.abs(F.col("delta_ppm")).desc(), F.col("bucket").asc()
    ).limit(top)


def corpus_drift_sql(
    slice_a_sql: str,
    slice_b_sql: str,
    n_buckets: int = 256,
    top: int = 30,
    table: str = "documents",
) -> str:
    """DuckDB twin — identical tokenization, bucket hash, ppm integer
    division and movers ordering. The token hash is
    :func:`pond_spark.functions.text.fingerprint_sql` — the SAME
    builder the Spark side's ``fingerprint`` mirrors — instead of an
    inline copy that could drift (r6 review fix)."""
    from pond_spark.functions.text import fingerprint_sql

    return f"""
WITH toks AS (
  SELECT a, b,
         {fingerprint_sql("word")} % {n_buckets}
           AS bucket
  FROM (SELECT ({slice_a_sql}) AS a, ({slice_b_sql}) AS b,
               unnest((CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END)) AS word
        FROM {table})),
per_bucket AS (
  SELECT bucket,
         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM toks WHERE a OR b GROUP BY bucket),
tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS ta,
               CAST(sum(cnt_b) AS BIGINT) AS tb FROM per_bucket),
scored AS (
  SELECT bucket, cnt_a, cnt_b,
         cnt_a * 1000000 // greatest(ta, 1) AS ppm_a,
         cnt_b * 1000000 // greatest(tb, 1) AS ppm_b,
         cnt_a * 1000000 // greatest(ta, 1)
           - cnt_b * 1000000 // greatest(tb, 1) AS delta_ppm
  FROM per_bucket CROSS JOIN tot)
SELECT bucket, cnt_a, cnt_b,
       CAST(ppm_a AS BIGINT) AS ppm_a, CAST(ppm_b AS BIGINT) AS ppm_b,
       CAST(delta_ppm AS BIGINT) AS delta_ppm
FROM scored ORDER BY abs(delta_ppm) DESC, bucket ASC LIMIT {top}
"""
