"""Repeated token-sequence detection (ExactSubstr, Lee et al. 2022).

"Deduplicating Training Data Makes Language Models Better" removes
every span of ≥ 50 *tokens* that appears more than once in the corpus,
using a suffix array. A suffix array is inherently sequential; the
distributed equivalent is token n-gram shingling at stride 1: every
n-token window, hashed. Any repeated span of ≥ n tokens contains an
aligned repeated window by construction — full recall, no alignment
blind spot (char-strided shingles miss repeats whose offsets differ
between documents; token windows are anchored by the tokenization
itself).

Scale notes (100 TB): the explode emits one (8 B hash, id, pos) row
per token — the same volume as the prefix-filter candidate stage in
dedup/ngram.py; the duplicate table groups on the hash with map-side
combine. ``min_docs`` counts *distinct documents*, so within-document
repetition (measured by functions/repetition.py) doesn't flag. The
per-doc output is the ExactSubstr removal budget: what fraction of
the document sits inside corpus-duplicated ≥ n-token spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _word_ngrams, _words
from pond_spark.util import fan_out

__all__ = ["token_shingles", "substring_dup_stats", "strip_duplicate_spans"]


def token_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """``(id, pos, sh)``: xxhash64 of the n-token window at every token
    position (stride 1). Documents shorter than n tokens yield no rows."""
    # stage the split ONCE: an inline `_words(col)` inside the
    # transform lambda re-derives the split per gram position (the
    # HOF-vs-CSE trap documented in PERF_NOTES.md)
    # fan_out: shingling is CPU-bound — small single-split inputs
    # must not pin the stride-1 explode to one core (same guard as
    # gram_hashes / simhash64)
    staged = fan_out(df).select(
        F.col(id_col), _words(F.col(text_col)).alias("_w")
    )
    grams = F.when(
        F.size("_w") >= n, _word_ngrams(F.col("_w"), n)
    ).otherwise(F.array().cast("array<string>"))
    return staged.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "_g")
    ).select(F.col(id_col), F.col("pos"), F.xxhash64(F.col("_g")).alias("sh"))


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Remove corpus-duplicated ≥ n-token spans; reassemble the rest.

    The ExactSubstr *removal* step: a token is cut iff it lies inside
    any flagged window (a window whose hash occurs in ≥ ``min_docs``
    distinct documents). Flagged windows explode to their n member
    token indices (bounded ×n fan-out), distinct per (doc, token),
    then anti-join the token stream; survivors reassemble in order.
    Returns ``(id, text_clean, n_tokens, n_removed)`` for every input
    document.
    """
    # the shingle frame feeds the duplicate table AND the flagged-window
    # semi-join; persist so the tokenize+gram+hash pass runs once
    # (guide §2.4 — Spark has no cross-branch CSE). Lifecycle: the pin
    # lives until the session drops it; loop drivers clearCache between
    # queries (bench.py does), same contract as the ngram/minhash pins.
    sh = token_shingles(df, text_col, id_col, n).persist()
    dup = (
        sh.groupBy("sh")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("sh")
    )
    cut = (
        sh.join(dup, on="sh", how="left_semi")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("tok"),
        )
        .distinct()
    )
    # reassemble from the ORIGINAL-case tokens: detection is canonical
    # (lowercased shingles via _words) but a removal pass must not
    # rewrite the surviving text — the r4 review caught the previous
    # _words-based reassembly lowercasing every document, including
    # ones with nothing to remove. Same trim+whitespace split as
    # _words, so token positions align exactly; inter-token whitespace
    # still collapses to single spaces (inherent to token reassembly,
    # documented).
    # persisted: feeds the anti-join (kept) and the per-doc totals
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("tok", "w"),
    ).persist()
    kept = toks.join(cut, on=[id_col, "tok"], how="left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tok", "w"))),
                lambda s: s.w,
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_nkept"),
    )
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        df.select(id_col)
        .join(totals, on=id_col, how="left")
        .join(reassembled, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            (
                F.coalesce(F.col("n_tokens"), F.lit(0))
                - F.coalesce(F.col("_nkept"), F.lit(0))
            ).alias("n_removed"),
        )
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document cross-corpus repeated-span profile.

    Returns ``(id, n_shingles, n_dup, dup_frac)``: ``n_dup`` counts
    this document's n-token windows whose hash occurs in ≥ ``min_docs``
    distinct documents; ``dup_frac`` is the duplicated-window fraction
    — the ExactSubstr removal budget. Documents under n tokens report
    0 shingles.
    """
    # persisted: feeds the duplicate table, the flagged semi-join AND
    # the per-doc totals (three branches; see strip_duplicate_spans)
    sh = token_shingles(df, text_col, id_col, n).persist()
    dup = (
        sh.groupBy("sh")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("sh")
    )
    flagged = sh.join(dup, on="sh", how="left_semi")
    totals = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    dups = flagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup"))
    return (
        df.select(id_col)
        .join(totals, on=id_col, how="left")
        .join(dups, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
            F.coalesce(F.col("n_dup"), F.lit(0)).alias("n_dup"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                    / F.col("n_shingles").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )
