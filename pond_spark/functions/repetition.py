"""Within-document repetition metrics (Gopher appendix A1.2).

Pre-training pipelines drop documents whose content is dominated by
repetition — boilerplate loops, keyword stuffing, scraped calendars.
Gopher (Rae et al. 2021) formalizes this as thresholds over (a) the
fraction of *characters* covered by the single most frequent n-gram
and (b) the fraction of words / n-grams that are duplicates.

Scale notes (100 TB): the duplicate fractions are single-pass array
expressions — no shuffle, whole-stage codegen, cost linear in document
length. The top-n-gram mode is computed by explode → two-level groupBy
on ``(doc_id, gram)`` then ``doc_id`` — deliberately NOT the O(words²)
``filter``-count-per-distinct-gram array expression, which would blow
up on long documents. Both shuffles key on (doc_id, 8 B gram hash) and
combine map-side; the final join back to the metric frame is on
``doc_id`` alone. Nothing in the path depends on corpus size except
through Spark's ordinary hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _word_ngrams, _words

__all__ = ["repetition_metrics"]


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram: int = 2,
    dup_ngram: int = 3,
) -> DataFrame:
    """Per-document repetition profile.

    Returns ``(id, n_words, dup_word_frac, dup_ngram_frac,
    top_ngram_char_frac)`` where

    - ``dup_word_frac``     = 1 − distinct words / words
    - ``dup_ngram_frac``    = 1 − distinct ``dup_ngram``-grams / grams
    - ``top_ngram_char_frac`` = chars covered by the single MOST
      FREQUENT ``top_ngram``-gram (its count × its length) / total
      chars — Gopher A1.2's "fraction of characters in the most
      common n-gram". The argmax is by count, ties broken toward the
      longer then lexicographically greatest gram, so the metric is
      deterministic and engine-portable.

    Fractions are rounded to 6 decimals for stable cross-engine
    hashing; empty documents score 0.0 everywhere.
    """
    kept = F.col(id_col)
    # persisted (r11, guide §2.4): the tokenized frame feeds BOTH the
    # single-pass metric projection and the top-n-gram explode branch —
    # unpinned, the scan + split ran twice. Session pin, cleared by
    # loop drivers (the ngram-pin contract).
    tokenized = df.select(
        kept,
        F.length(F.col(text_col)).cast("double").alias("_nchars"),
        _words(F.col(text_col)).alias("_w"),
    ).persist()
    staged = tokenized.select(
        kept,
        F.col("_nchars"),
        F.col("_w"),
        F.size("_w").alias("n_words"),
        _word_ngrams(F.col("_w"), dup_ngram).alias("_g"),
    )
    nw = F.col("n_words").cast("double")
    ng = F.size("_g").cast("double")
    metrics = staged.select(
        kept,
        F.col("_nchars"),
        F.col("n_words"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(1.0) - F.size(F.array_distinct("_w")).cast("double") / nw,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_word_frac"),
        F.round(
            F.when(
                F.size("_g") > 0,
                F.lit(1.0) - F.size(F.array_distinct("_g")).cast("double") / ng,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias(f"dup_{dup_ngram}gram_frac"),
    )
    # top-n-gram coverage: explode + two groupBys, linear in doc length
    # (re-uses the persisted tokenized frame — no second scan/split)
    grams = tokenized.select(
        kept, F.explode(_word_ngrams(F.col("_w"), top_ngram)).alias("gram")
    )
    # argmax by count (NOT max over count*length: a longer but rarer
    # gram must not win) — struct-max gives a deterministic tie-break
    # by (count, length, gram) with identical ordering in DuckDB
    top = (
        grams.groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_cnt"),
                    F.length("gram").cast("long").alias("_len"),
                    F.col("gram"),
                )
            ).alias("_top")
        )
        .select(
            F.col(id_col),
            (F.col("_top._cnt") * F.col("_top._len")).alias("_covered"),
        )
    )
    return (
        metrics.join(top, on=id_col, how="left")
        .select(
            kept,
            F.col("n_words"),
            F.col("dup_word_frac"),
            F.col(f"dup_{dup_ngram}gram_frac"),
            F.round(
                F.when(
                    (F.col("_nchars") > 0) & F.col("_covered").isNotNull(),
                    F.least(
                        F.col("_covered").cast("double") / F.col("_nchars"),
                        F.lit(1.0),
                    ),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"top_{top_ngram}gram_char_frac"),
        )
    )
