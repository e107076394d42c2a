"""TF-IDF keyword extraction over the documents corpus — per-doc top-k
distinctive terms (training-data curation: topical tagging, quality
inspection, per-source vocabulary drift).

Beyond the reference surface (pond has no text analytics; north-star
family next to functions.text's token/quality/lang-id signals).

Shape: one explode, two narrow-key groupBys (per-(doc, term) TF and
per-term DF — both map-side combined), one shuffle join on the term,
one per-doc window for the top-k. At 100 TB every shuffle key is a
single string or id; the DF table is vocab-sized (zipf-bounded), and
``min_df`` pruning shrinks the join input before the shuffle.

Numeric-determinism: the tf-idf score is quantized to an integer —
``score_q = tf * floor(ln(n_docs/df) * 1e6)`` — so ranking, top-k
cutoff and the oracle hash all compare integers. Both engines compute
``ln`` on the identical IEEE double ``n_docs/df`` (the durable
hash-stability rule from PERF_NOTES: floats never enter a hashed
projection or an ordering key un-quantized).

ACCEPTED hash-stability risk (explicit adjudication): ``ln`` has no
exact integer reformulation and ``score_q`` is hashed, so a libm
last-ulp difference exactly on a floor boundary would flake the row.
The exposed set is tiny — one floored value per DISTINCT (n_docs, df)
pair, since tf multiplies after the floor — and the margin is
measured: tests/test_quantization_margin.py audits every distinct idf
on the correctness corpus and fails if any sits closer to a boundary
than 1000x the worst-case ulp perturbation (observed slack at sf0.01:
~4e7x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pond_spark.functions.text import _words

#: idf quantization: 1e6 ≈ 6 decimal digits of ln(), plenty to order
#: terms and stable across engines (see module docstring)
IDF_SCALE = 1_000_000


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-doc top-``k`` terms by quantized tf-idf:
    ``(doc_id, word, tf, df, score_q, rank)`` — all integer/string
    columns, ties broken by term for determinism."""
    w = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    )
    # persisted: tf feeds BOTH the document-frequency rollup and the
    # scoring join — and df is derived FROM tf (count of (doc, word)
    # rows per word == count_distinct(doc) per word, exactly), so the
    # corpus is exploded once instead of twice and the DF aggregation
    # runs over the (much smaller) per-doc term table (guide §2.3/§2.4).
    # Lifecycle: session pin, cleared by loop drivers (the ngram-pin
    # contract).
    tf = w.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfc = (
        tf.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    ndocs = docs.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    idf_q = F.floor(
        F.log(F.col("n_docs").cast("double") / F.col("df")) * F.lit(float(IDF_SCALE))
    ).cast("long")
    scored = (
        tf.join(dfc, "word")
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col(id_col),
            "word",
            "tf",
            "df",
            (F.col("tf") * idf_q).alias("score_q"),
        )
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("score_q").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "word", "tf", "df", "score_q", "rank")
    )


def tfidf_keywords_sql(k: int = 5, min_df: int = 1, table: str = "documents") -> str:
    """DuckDB twin — identical tokenization, quantization and ordering."""
    return f"""
WITH w AS (SELECT doc_id,
                  unnest((CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END)) AS word
           FROM {table}),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
dfc AS (SELECT word, count(DISTINCT doc_id) AS df FROM w
        GROUP BY word HAVING count(DISTINCT doc_id) >= {min_df}),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM {table}),
s AS (SELECT tf.doc_id AS doc_id, tf.word AS word, tf.tf AS tf, dfc.df AS df,
             tf.tf * CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / dfc.df)
                                * {float(IDF_SCALE)!r}) AS BIGINT) AS score_q
      FROM tf JOIN dfc USING (word) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_q DESC, word ASC) AS rank
      FROM s)
SELECT doc_id, word, tf, df, score_q, rank FROM r WHERE rank <= {k}
"""
