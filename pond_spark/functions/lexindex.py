"""Persisted full-text (BM25) postings index — the lexical twin of the
IVF vector index (similarity/index.py): build once, search many times,
and make every search read ONLY the slivers of the index its query
terms live in.

Layout (one parquet table + a JSON meta sidecar):

- ``build_text_index()`` tokenizes once, computes the classic posting
  row ``(word, doc_id, tf)`` and DENORMALIZES the two per-row scoring
  stats into it: ``dl`` (doc length — per doc) and ``df`` (document
  frequency — per word). A posting row is then self-sufficient for
  BM25 scoring given only the two corpus scalars (n_docs, sum_dl)
  kept in the sidecar. Storage pays two extra longs per posting;
  search pays ZERO joins.
- The table is ``partitionBy("word_bucket")`` with
  ``word_bucket = pmod(xxhash64(word), n_buckets)`` and
  ``sortWithinPartitions(word)``: a query's terms map to at most
  len(terms) buckets — the ``word_bucket IN (...)`` predicate is a
  partition filter (directories never opened, plan-asserted in
  tests), and the within-bucket sort gives parquet min/max row-group
  skipping on the residual ``word IN (...)`` filter.
- ``search()`` scans the pruned postings, computes the SAME
  integer-quantized contribution expression as functions/bm25.py
  (identical literals and operation order — results are equal by
  construction, asserted in tests and oracle-checked), and finishes
  with one narrow groupBy on doc_id over only the matching postings.

At 100 TB: the index build is the one full-corpus pass (two narrow
groupBys + one partitioned write); each search touches
O(postings-of-query-terms) rows — independent of corpus size for
selective terms. The index is an immutable snapshot: appending
documents would stale the denormalized ``df``/corpus stats, so
refresh = rebuild (segment merging à la Lucene is the production
extension; the layout is segment-shaped already).

No counterpart in the reference (pond has no text retrieval);
mirrors the inverted-file layout every search engine uses (Zobel &
Moffat, "Inverted files for text search engines", CSUR 2006).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pond_spark.functions.bm25 import BM25_SCALE
from pond_spark.functions.text import _words

__all__ = ["build_text_index", "TextIndex"]

_META = "_text_index_meta.json"


def build_text_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "TextIndex":
    """Tokenize, aggregate postings, denormalize scoring stats, write
    bucket-partitioned. One corpus pass: explode → groupBy(doc, word)
    → two narrow stat joins sized by vocab/doc-count, not postings."""
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    )
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # dl from the postings themselves (sum tf per doc) — saves the
    # second pass over raw text
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfc = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    ).first()

    postings = (
        tf.join(dl, "doc_id")
        .join(dfc, "word")
        .withColumn(
            "word_bucket", F.pmod(F.xxhash64("word"), F.lit(n_buckets))
        )
    )
    (
        postings.repartition("word_bucket")
        .sortWithinPartitions("word")
        .write.mode("overwrite")
        .partitionBy("word_bucket")
        .parquet(path)
    )
    meta = {
        "n_docs": int(stats["n_docs"]),
        "sum_dl": int(stats["sum_dl"]),
        "n_buckets": int(n_buckets),
    }
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh)
    return TextIndex(df.sparkSession, path)


def _xxhash64_py(spark: SparkSession, words: Sequence[str]) -> list[int]:
    """Driver-side xxhash64 of the query terms via a 1-row expression
    eval — keeps the bucket function defined in exactly ONE place (the
    JVM implementation) instead of re-implementing the hash in
    Python."""
    row = (
        spark.range(1)
        .select(
            *[
                F.xxhash64(F.lit(t)).alias(f"h{i}")
                for i, t in enumerate(words)
            ]
        )
        .first()
    )
    return [row[i] for i in range(len(words))]


class TextIndex:
    """Open a built index; ``search()`` is the query-time surface."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, _META)) as fh:
            self.meta = json.load(fh)

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def search(
        self,
        query_terms: Sequence[str],
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-``k`` ``(doc_id, n_terms, score_q)`` — identical output
        to functions/bm25.bm25_search on the indexed corpus (same
        quantized contribution expression, same ordering)."""
        if not query_terms:
            raise ValueError("search needs at least one query term")
        terms = [t.lower() for t in query_terms]
        nb = int(self.meta["n_buckets"])
        hashes = _xxhash64_py(self.spark, terms)
        buckets = sorted({h % nb for h in hashes})

        n_docs = F.lit(int(self.meta["n_docs"]))
        avgdl = F.lit(float(self.meta["sum_dl"])) / n_docs
        p = (
            self.postings()
            # partition filter first (directories pruned), then the
            # row-group-skippable residual on the sorted word column
            .filter(F.col("word_bucket").isin(buckets))
            .filter(F.col("word").isin(terms))
        )
        idf = F.log(
            F.lit(1.0)
            + ((n_docs - F.col("df")) + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
        )
        contrib_q = F.floor(idf * tfn * F.lit(float(BM25_SCALE))).cast("long")
        return (
            p.select("doc_id", contrib_q.alias("cq"))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.sum("cq").alias("score_q"),
            )
            .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
            .limit(k)
        )
