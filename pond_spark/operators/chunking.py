"""Document chunking: split long documents into token-bounded,
optionally-overlapping chunks — the context-window preparation step
between curation and tokenization in a training-data pipeline (and the
unit of retrieval for embedding indexes).

Beyond the reference surface; north-star family next to packing
(operators/packing.py packs docs INTO a budget, this splits docs that
EXCEED one).

Shape: pure per-row expressions — tokenize once, generate candidate
chunk starts with ``sequence``, explode, slice. No joins, no windows,
no shuffle at all: chunking is embarrassingly parallel and the plan is
a single projection stage at any scale.

Chunk rule (deterministic, both engines): starts at ``i*stride`` for
``stride = chunk_tokens - overlap``; a chunk is emitted iff it is the
first (``i = 0``) or it covers at least one token beyond the previous
chunk (``i*stride + overlap < n_tokens``) — no fully-redundant tail
chunk. Reassembly canonicalizes whitespace to single spaces (the same
convention as dedup/substr.py's span removal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """``(doc_id, chunk_id, n_tokens, chunk_text)`` per emitted chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    base = docs.select(
        F.col(id_col), toks.alias("_ws"), n.alias("_n")
    ).withColumn(
        # candidate starts 0..floor(n/stride); over-generate then filter
        "_i",
        F.explode(
            F.sequence(F.lit(0), (F.col("_n") / F.lit(stride)).cast("int"))
        ),
    )
    s = F.col("_i") * stride
    kept = base.filter(
        (s < F.col("_n"))
        & ((F.col("_i") == 0) | (s + F.lit(overlap) < F.col("_n")))
    )
    chunk = F.slice(F.col("_ws"), s + 1, F.lit(chunk_tokens))
    return kept.select(
        F.col(id_col),
        F.col("_i").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk_tokens: int = 128, overlap: int = 16, table: str = "documents"
) -> str:
    """DuckDB twin — identical tokenization, start rule and slicing."""
    stride = chunk_tokens - overlap
    return f"""
WITH base AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
              FROM {table}),
idx AS (SELECT doc_id, ws, len(ws) AS n,
               unnest(generate_series(0, len(ws) // {stride})) AS i
        FROM base),
kept AS (SELECT doc_id, i, n,
                ws[i*{stride} + 1 : i*{stride} + {chunk_tokens}] AS cw
         FROM idx
         WHERE i*{stride} < n AND (i = 0 OR i*{stride} + {overlap} < n))
SELECT doc_id, i AS chunk_id, len(cw) AS n_tokens,
       array_to_string(cw, ' ') AS chunk_text
FROM kept
"""
