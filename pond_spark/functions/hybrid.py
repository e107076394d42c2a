"""Hybrid retrieval: lexical BM25 + vector cosine, fused with
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
the standard two-tower retrieval shape of RAG / training-data search
stacks: keyword recall catches what embeddings miss and vice versa,
and RRF combines them with no score calibration at all.

Beyond the reference surface (pond has no retrieval); composes
functions/bm25.py with similarity/brute.py (swap in the IVF/PQ path
for the vector leg at scale — any (id, rank) frame fuses).

RRF: ``score(d) = Σ_sources 1 / (k0 + rank_s(d))`` over the sources
that returned d (k0=60, the paper's constant). Ranks are small exact
integers, each reciprocal is the same IEEE double in every engine,
and the two-term sum is written in a FIXED source order — so the
fused ordering is bit-reproducible and the hashed projection is
integer ranks only (PERF_NOTES hash-stability rule).

100 TB shape: each leg is already a top-n (TakeOrderedAndProject /
index probe) — the fusion joins two n-row frames; its cost is nil
next to the legs. The full-outer join keys on the doc id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: the RRF constant from Cormack et al. 2009
RRF_K0 = 60


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    k0: int = RRF_K0,
) -> DataFrame:
    """Fuse (id, rank) frames: ``(id, rank_1..rank_n, rank)``.

    Missing docs contribute 0 to the fused score (absent from that
    source's top-n). Final order: RRF score desc, id asc; the
    emitted columns are integer ranks only — the double score stays
    internal to the ordering."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = None
    for i, r in enumerate(rankings, start=1):
        leg = r.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"rank_{i}")
        )
        fused = leg if fused is None else fused.join(leg, id_col, "full_outer")
    # fixed source order: term i added in sequence → identical fold in
    # every engine
    score = F.lit(0.0)
    for i in range(1, len(rankings) + 1):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"rank_{i}")), F.lit(0.0)
        )
    win = Window.orderBy(score.desc(), F.col(id_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            *[f"rank_{i}" for i in range(1, len(rankings) + 1)],
            "rank",
        )
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    n_per_leg: int = 25,
    k0: int = RRF_K0,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Top-``k`` hybrid results: ``(doc_id, rank_1, rank_2, rank)``
    with rank_1 = BM25 leg, rank_2 = cosine leg (NULL = not in that
    leg's top-``n_per_leg``)."""
    from pond_spark.functions.bm25 import bm25_search
    from pond_spark.similarity.brute import brute_force_topk

    bm = bm25_search(docs, query_terms, text_col, doc_id_col, k=n_per_leg)
    w1 = Window.orderBy(F.col("score_q").desc(), F.col(doc_id_col).asc())
    bm_rank = bm.select(
        F.col(doc_id_col), F.row_number().over(w1).alias("rank")
    )

    vec = brute_force_topk(
        embeddings, query_vec, k=n_per_leg, vec_col=vec_col, id_col=vec_id_col
    )
    w2 = Window.orderBy(F.col("cosine").desc(), F.col(vec_id_col).asc())
    vec_rank = vec.select(
        F.col(vec_id_col).alias(doc_id_col),
        F.row_number().over(w2).alias("rank"),
    )
    return rrf_fuse(
        [bm_rank, vec_rank], id_col=doc_id_col, k=k, k0=k0
    )
