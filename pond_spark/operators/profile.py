"""Corpus profiling — the per-slice "dataset card" aggregate every
training-data pipeline publishes next to a release: per (source,
language) document counts, token/char volume, exact-duplicate mass.

Beyond the reference surface (pond's only corpus-level view is STATS,
S11); this is the documents-table analog: one map-side-combined
groupBy over narrow derived columns (token count and content digest
are per-row expressions, no joins), so at 100 TB it is a single
shuffle of ~n_groups partial aggregates per mapper.

Hash-stability: every output column is an exact integer — duplicate
mass is reported as parts-per-million via INTEGER division (both
engines floor the non-negative ratio identically), never a rounded
float ratio (PERF_NOTES rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import token_count, token_count_sql


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = ("source", "lang"),
) -> DataFrame:
    """Per-group ``(n_docs, n_tokens, n_chars, n_unique, dup_ppm)``.

    NULL-text docs count as UNIQUE, one each (r6 review fix): absent
    content can't be compared, so it must not inflate the duplicate
    mass — ``count_distinct`` excludes NULL digests, so the NULL-doc
    count is added back explicitly in both engines."""
    t = F.col(text_col)
    # two-level aggregation (r11, guide §2.3): count_distinct mixed
    # with plain sums planned an Expand (×2 duplication of the input
    # rows before the exchange). Aggregate per (group, digest) first —
    # map-side combined — then roll up: sum of per-digest counts/sums
    # reproduces every total exactly, a non-null digest row contributes
    # 1 unique, and the NULL-digest row contributes its doc count (the
    # NULL-as-unique rule, one each).
    per_digest = docs.groupBy(
        *group_cols, F.sha2(t, 256).alias("_dg")
    ).agg(
        F.count(F.lit(1)).alias("_nd"),
        F.sum(token_count(t)).alias("_nt"),
        F.sum(F.length(t)).alias("_nc"),
    )
    return (
        per_digest.groupBy(*group_cols)
        .agg(
            F.sum("_nd").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.sum("_nc").alias("n_chars"),
            F.sum(
                F.when(F.col("_dg").isNull(), F.col("_nd")).otherwise(
                    F.lit(1).cast("long")
                )
            ).alias("n_unique"),
        )
        .withColumn(
            "dup_ppm",
            F.expr("(n_docs - n_unique) * 1000000 div n_docs"),
        )
    )


def corpus_profile_sql(
    table: str = "documents", group_cols: Sequence[str] = ("source", "lang")
) -> str:
    """DuckDB twin — identical tokenization, digest, NULL-as-unique
    rule and ppm division."""
    g = ", ".join(group_cols)
    tc = token_count_sql("text")
    uniq = (
        "(count(DISTINCT sha256(text))"
        " + sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END))"
    )
    return f"""
SELECT {g}, count(*) AS n_docs,
       CAST(sum({tc}) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST({uniq} AS BIGINT) AS n_unique,
       CAST((count(*) - {uniq}) * 1000000 // count(*) AS BIGINT) AS dup_ppm
FROM {table} GROUP BY {g}
"""
