"""Model-based document classification: multinomial Naive Bayes with
Laplace smoothing, trained and applied entirely inside the engine —
the classic statistical ancestor of the fastText classifiers CCNet/
LLaMA-style curation pipelines use for language-id and quality
filtering (Wenzek et al. 2020 §3.2; Joulin et al. 2017). No model
files, no Python in the scoring path: training is three narrow-key
aggregations and scoring is one join + one window.

Shape, end to end (train split → predictions):

- **split**: deterministic ``id % train_mod`` holdout — reproducible
  on any engine, no RNG.
- **train**: per-class doc counts (priors), per-(class, word) token
  counts (likelihoods), per-class totals + vocabulary size. All
  map-side-combined groupBys over exploded tokens.
- **score**: holdout tokens × the (tiny) class dimension, left-joined
  against the (class, word) count table — the join key is the word,
  so the count table shuffles once regardless of corpus size. Unseen
  words fall back to the smoothing floor via coalesce(cnt, 0).
- **predict**: per-doc per-class score sum, argmax via row_number
  (score desc, class asc — deterministic ties).

At 100 TB: the exploded-token × n_classes frame is the big join input;
it is ids+word+class only (no text), the count table is vocab×classes
(zipf-bounded, broadcastable when small), and everything downstream of
the join is a two-key groupBy.

Numeric determinism (the PERF_NOTES hash-stability rule): log-
probabilities are quantized to integers BEFORE summation —
``logq = floor(ln((cnt+1)/(total_c+V)) * 1e6)`` — so per-doc scores,
the argmax and the oracle hash compare exact BIGINTs. Both engines
compute ``ln`` of the identical IEEE-double ratio.

ACCEPTED hash-stability risk (explicit adjudication): ``ln`` has no
exact integer reformulation, and here the quantized score IS hashed
(``score_q`` is an output column), so a libm last-ulp difference
landing exactly on a floor boundary would flake the row. Kept because
the exposure is measured, not assumed: tests/
test_quantization_margin.py audits every reachable log-likelihood and
prior on the correctness corpus and fails if any sits closer to a
boundary than 1000x the worst-case ulp perturbation (observed slack
at sf0.01: ~3.5e4x for likelihoods, ~8e6x for priors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pond_spark.functions.text import _words

#: log-probability quantization scale (6 decimal digits)
LOGQ_SCALE = 1_000_000


def _logq(num, den) -> F.Column:
    """floor(ln(num/den) * SCALE) as BIGINT — num/den computed as one
    IEEE double division so both engines see the identical input."""
    return F.floor(
        F.log(num.cast("double") / den) * F.lit(float(LOGQ_SCALE))
    ).cast("long")


def nb_classify(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    train_mod: int = 5,
    holdout_rem: int = 0,
) -> DataFrame:
    """Train on ``id % train_mod != holdout_rem``, predict the held-out
    rest: ``(doc_id, label, predicted, score_q, n_tokens, correct)``
    — integer/string columns only, deterministic ties."""
    is_holdout = F.pmod(F.col(id_col), F.lit(train_mod)) == holdout_rem
    train = docs.filter(~is_holdout)
    test = docs.filter(is_holdout)

    tw = train.select(
        F.col(label_col).alias("cls"),
        F.explode(_words(F.col(text_col))).alias("word"),
    )
    # ONE pass over the exploded train tokens (r11, guide §2.3/§2.4):
    # totals and vocab are exact rollups OF the (cls, word) count table
    # (sum of cnt per class == token total; distinct words == count-
    # table words), so the old three independent aggregations — each
    # re-running the scan+explode — collapse into one. Persisted: the
    # count table feeds totals, vocab AND the scoring map (session pin,
    # cleared by loop drivers — the ngram-pin contract).
    counts = (
        tw.groupBy("cls", "word").agg(F.count(F.lit(1)).alias("cnt")).persist()
    )
    totals = counts.groupBy("cls").agg(F.sum("cnt").alias("total_c"))
    vocab = counts.select(F.count_distinct("word").alias("v"))
    # priors from per-class doc counts
    cls_docs = train.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_docs_c")
    )
    n_train = train.select(F.count(F.lit(1)).alias("n_train"))
    classes = (
        cls_docs.crossJoin(F.broadcast(n_train))
        .join(totals, "cls")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cls",
            _logq(F.col("n_docs_c"), F.col("n_train")).alias("prior_q"),
            "total_c",
            "v",
        )
    )

    sw = test.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.explode(_words(F.col(text_col))).alias("word"),
    )
    # score per DISTINCT (doc, word) instead of per token×class (r11,
    # guide §2.3): sum over tokens of logq(word, cls) equals the sum
    # over distinct words of occurrences × logq — exact BIGINT either
    # way. The big join input shrinks from |test tokens| × |classes|
    # rows to |distinct (doc, word)| rows, the count table collapses
    # to one row per word (class → cnt map), and the ×|classes|
    # fan-out happens AFTER the join, on the aggregated frame.
    sw2 = sw.groupBy(id_col, "label", "word").agg(
        F.count(F.lit(1)).alias("_k")
    )
    # NULL-class rows can't be map keys; the old (cls, word) equi-join
    # never matched them either, so dropping them is exactly equivalent
    wmap = (
        counts.filter(F.col("cls").isNotNull())
        .groupBy("word")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("cls"), F.col("cnt")))
            ).alias("_m")
        )
    )
    scored = (
        sw2.join(wmap, "word", "left")
        .crossJoin(F.broadcast(classes))
        .select(
            F.col(id_col),
            "label",
            "cls",
            "prior_q",
            F.col("_k"),
            (
                F.col("_k")
                * _logq(
                    F.coalesce(
                        F.element_at(F.col("_m"), F.col("cls")), F.lit(0)
                    )
                    + F.lit(1),
                    F.col("total_c") + F.col("v"),
                )
            ).alias("logq_k"),
        )
    )
    per_class = scored.groupBy(id_col, "label", "cls", "prior_q").agg(
        F.sum("logq_k").alias("sum_logq"), F.sum("_k").alias("n_tokens")
    )
    win = Window.partitionBy(id_col).orderBy(
        (F.col("prior_q") + F.col("sum_logq")).desc(), F.col("cls").asc()
    )
    return (
        per_class.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(id_col),
            "label",
            F.col("cls").alias("predicted"),
            (F.col("prior_q") + F.col("sum_logq")).alias("score_q"),
            "n_tokens",
            (F.col("cls") == F.col("label")).cast("int").alias("correct"),
        )
    )


def nb_classify_sql(
    label_col: str = "lang",
    train_mod: int = 5,
    holdout_rem: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB twin — identical split, counts, quantization, argmax."""
    s = float(LOGQ_SCALE)
    return f"""
WITH train AS (SELECT * FROM {table}
               WHERE ((doc_id % {train_mod}) + {train_mod}) % {train_mod} != {holdout_rem}),
test AS (SELECT * FROM {table}
         WHERE ((doc_id % {train_mod}) + {train_mod}) % {train_mod} = {holdout_rem}),
tw AS (SELECT {label_col} AS cls,
              unnest((CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END)) AS word
       FROM train),
counts AS (SELECT cls, word, count(*) AS cnt FROM tw GROUP BY cls, word),
totals AS (SELECT cls, count(*) AS total_c FROM tw GROUP BY cls),
vocab AS (SELECT count(DISTINCT word) AS v FROM tw),
cls_docs AS (SELECT {label_col} AS cls, count(*) AS n_docs_c FROM train GROUP BY 1),
n_train AS (SELECT count(*) AS n_train FROM train),
classes AS (SELECT cd.cls AS cls,
                   CAST(floor(ln(CAST(cd.n_docs_c AS DOUBLE) / nt.n_train) * {s!r})
                        AS BIGINT) AS prior_q,
                   t.total_c AS total_c, vb.v AS v
            FROM cls_docs cd CROSS JOIN n_train nt
            JOIN totals t ON t.cls = cd.cls CROSS JOIN vocab vb),
sw AS (SELECT doc_id, {label_col} AS label,
              unnest((CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END)) AS word
       FROM test),
scored AS (SELECT sw.doc_id AS doc_id, sw.label AS label, c.cls AS cls,
                  c.prior_q AS prior_q,
                  CAST(floor(ln(CAST(coalesce(k.cnt, 0) + 1 AS DOUBLE)
                                / (c.total_c + c.v)) * {s!r}) AS BIGINT) AS logq
           FROM sw CROSS JOIN classes c
           LEFT JOIN counts k ON k.cls = c.cls AND k.word = sw.word),
per_class AS (SELECT doc_id, label, cls, prior_q,
                     CAST(sum(logq) AS BIGINT) AS sum_logq,
                     count(*) AS n_tokens
              FROM scored GROUP BY doc_id, label, cls, prior_q),
ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY (prior_q + sum_logq) DESC, cls ASC) AS _rk
           FROM per_class)
SELECT doc_id, label, cls AS predicted,
       CAST(prior_q + sum_logq AS BIGINT) AS score_q,
       n_tokens, CAST(cls = label AS INT) AS correct
FROM ranked WHERE _rk = 1
"""
