"""Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
tokenizer-training step of a pretraining-data pipeline, run where the
corpus lives instead of sampling it down to one machine.

Shape: the corpus is reduced ONCE to the (word, count) vocabulary
frame — the only corpus-wide shuffle. Every merge iteration then runs
on that vocabulary-sized frame: explode adjacent symbol pairs
(weighted by word count), one map-side-combined groupBy, take the
argmax pair (a bounded 1-row collect per iteration — the IVF-Lloyd
pattern), and rewrite each word's symbol array with a greedy
leftmost-nonoverlapping merge expressed as a JVM ``aggregate`` lambda
(no Python in the loop). ``localCheckpoint`` truncates lineage per
iteration so ``n_merges`` stays O(1) plan depth.

At 100 TB the vocabulary frame is millions of rows, not trillions —
iterating on it is exactly how productionized distributed BPE works;
the token stream itself is never re-scanned. Applying a trained
merge table to the corpus (``bpe_segment``) also runs on distinct
words, then broadcasts the word→pieces map back onto the token
stream.

Oracle note: merge selection is an ITERATIVE argmax whose every step
retokenizes the vocabulary — per VERDICT's non-SQL-expressible
category (iterative algorithms) the registry entry is rows-only;
correctness is pinned by an exact-match pytest against an
independent pure-Python reference implementation, including
tie-break order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _words

__all__ = ["bpe_train", "bpe_segment", "END"]

#: end-of-word sentinel symbol (Sennrich's </w>)
END = "</w>"


def _initial_symbols(word: Column) -> Column:
    chars = F.filter(F.split(word, ""), lambda x: x != "")
    return F.concat(chars, F.array(F.lit(END)))


def _merge_expr(sym: Column, a: str, b: str) -> Column:
    """Greedy leftmost non-overlapping replacement of adjacent
    (a, b) with a+b — the BPE merge rule — as a pure JVM aggregate
    lambda over the symbol array."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(left, right, cnt) for every adjacent symbol pair, weighted by
    word count; single-symbol words contribute nothing."""
    return (
        words.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1).alias("l"),
                    F.slice(F.col("sym"), 2, F.size("sym") - 1).alias("r"),
                )
            ).alias("p"),
        )
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("cnt").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns an
    ordered merge table ``(rank, left, right, pair_count)``.

    Deterministic: argmax ties break lexicographically on
    (left, right); training stops early when no pair reaches
    ``min_pair_count`` (merging singleton pairs only memorizes
    individual words)."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_initial_symbols(F.col("word")).alias("sym"), "cnt")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(words)
            .filter(F.col("pair_count") >= min_pair_count)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0].left, best[0].right, best[0].pair_count
        merges.append((rank, a, b, n))
        words = words.select(
            _merge_expr(F.col("sym"), a, b).alias("sym"), "cnt"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merge_rows: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list:
    ``(id, word, pieces)`` — one row per token occurrence.

    The merge chain is applied to the DISTINCT word frame (vocabulary-
    sized; checkpointed every few merges to bound expression depth),
    then broadcast-joined back onto the exploded token stream — the
    expensive per-symbol work never touches corpus-scale rows."""
    toks = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    vocab = toks.select("word").distinct().select(
        "word", _initial_symbols(F.col("word")).alias("pieces")
    )
    for i, (a, b) in enumerate(merge_rows):
        vocab = vocab.select(
            "word", _merge_expr(F.col("pieces"), a, b).alias("pieces")
        )
        if (i + 1) % 8 == 0:
            vocab = vocab.localCheckpoint()
    return toks.join(F.broadcast(vocab), "word").select(
        id_col, "word", "pieces"
    )
