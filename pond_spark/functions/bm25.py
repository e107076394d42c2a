"""BM25 keyword retrieval over the documents corpus — the lexical
complement to the vector-similarity family (similarity/): rank
documents for a bag of query terms with Okapi BM25 (Robertson &
Walker, SIGIR'94; the k1/b form every search engine ships).

Beyond the reference surface (pond has no text retrieval); pairs with
functions/tfidf.py (same explode/groupBy skeleton, a query-conditioned
scorer instead of a per-doc profile).

Shape: the term filter (``word IN query_terms``) lands right after the
explode, so everything downstream — per-(doc, term) TF, per-term DF,
the doc-length join — is sized by the MATCHING postings, not the
corpus. Doc lengths are one map-side-combined groupBy; corpus stats
(N, total length) are a single-row broadcast. At 100 TB this is: one
exploded scan with an early filter, two narrow-key shuffles, a top-k.

Numeric determinism: the per-(doc, term) BM25 contribution is computed
as ONE double expression with identical literals and operation order
in both engines, then floor-quantized to an integer; per-doc scores
are exact BIGINT sums of those, so ranking, cutoff and hash never
compare raw floats (PERF_NOTES hash-stability rule).

ACCEPTED hash-stability risk (the explicit adjudication PERF_NOTES
requires for every floor(double) that can reach a hashed column or an
ordering key): the score contains ``ln``, which has no exact integer
reformulation, so a last-ulp difference between the JVM's and the
oracle engine's libm could in principle flip ``floor(x * 1e6)`` when
``x * 1e6`` sits within ~1 ulp of an integer. Kept because (a) the
registered query hashes only ``(doc_id, n_terms, rank)`` — the score
is demoted to an internal ordering key, so a flip must reorder two
docs, not merely move one value — and (b) the margin is MEASURED, not
assumed: tests/test_quantization_margin.py audits every contribution
on the correctness corpus and fails if any sits closer to a boundary
than 1000x the worst-case ulp perturbation (observed slack at sf0.01:
~6e6x)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _words

#: score quantization scale (6 decimal digits of the BM25 score)
BM25_SCALE = 1_000_000


def bm25_contribution_q(
    tf, df, dl, n_docs, avgdl, k1: float = 1.2, b: float = 0.75
):
    """The quantized per-(doc, term) Okapi contribution as ONE double
    expression — THE definition both the in-query search below and the
    persisted index (functions/lexindex.py) score with, so their
    exact-equality contract can't drift apart edit by edit. All five
    stat inputs are Columns; literals and operation order here must
    stay mirrored in :func:`bm25_search_sql`."""
    idf = F.log(
        F.lit(1.0) + ((n_docs - df) + F.lit(0.5)) / (df + F.lit(0.5))
    )
    tfn = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl))
    )
    return F.floor(idf * tfn * F.lit(float(BM25_SCALE))).cast("long")


def bm25_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs for ``query_terms``:
    ``(doc_id, n_terms, score_q)`` — integer columns, ties by id."""
    if not query_terms:
        raise ValueError("bm25_search needs at least one query term")
    # dedupe while preserving order: a repeated query term must count
    # once, exactly as the old groupBy(word) made it
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    w = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    )
    # ONE pass over the exploded tokens (r11, guide §2.3/§2.4): the old
    # shape exploded the corpus twice (doc-length pass + term-frequency
    # pass) and shuffled a (doc, word) key; the query terms are a fixed
    # small list, so per-term TFs fold into the same map-side-combined
    # per-doc aggregation as the doc length — one explode, one id-keyed
    # exchange, then a bounded ×|terms| unpivot. Persisted: feeds the
    # corpus stats AND the scoring frame (session pin, ngram contract).
    per_doc = (
        w.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("word") == t).cast("long")).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        .persist()
    )
    stats = per_doc.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = per_doc.select(
        F.col(id_col),
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("word"), F.col(f"_tf{i}").alias("tf")
                    )
                    for i, t in enumerate(terms)
                ]
            )
        ).alias("_wt"),
    ).select(
        F.col(id_col), "dl", F.col("_wt.word").alias("word"),
        F.col("_wt.tf").alias("tf"),
    ).filter(F.col("tf") > 0)
    # the DF table is at most |terms| rows — broadcast it
    dfc = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    contrib_q = bm25_contribution_q(
        F.col("tf"), F.col("df"), F.col("dl"), F.col("n_docs"), avgdl, k1, b
    )

    scored = (
        tf.join(F.broadcast(dfc), "word")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), contrib_q.alias("cq"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("cq").alias("score_q"))
        .orderBy(F.col("score_q").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_search_sql(
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin — identical literals and operation order."""
    if not query_terms:
        raise ValueError("bm25_search_sql needs at least one query term")
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    s = float(BM25_SCALE)
    return f"""
WITH w AS (SELECT doc_id,
                  unnest((CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END)) AS word
           FROM {table}),
dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
stats AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dl),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w
       WHERE word IN ({terms}) GROUP BY doc_id, word),
dfc AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
scored AS (
  SELECT tf.doc_id AS doc_id,
         CAST(floor(
           ln(1.0 + ((s.n_docs - dfc.df) + 0.5) / (dfc.df + 0.5))
           * ((tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r}
              * (dl.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))))
           * {s!r}) AS BIGINT) AS cq
  FROM tf JOIN dfc USING (word) JOIN dl USING (doc_id) CROSS JOIN stats s)
SELECT doc_id, count(*) AS n_terms, CAST(sum(cq) AS BIGINT) AS score_q
FROM scored GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC LIMIT {k}
"""
