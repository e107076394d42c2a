"""Build-once / search-many retrieval serving: a persisted BM25
postings index, a persisted IVF vector index, and hybrid RRF fusion
of both legs — the two-tower search stack over one corpus.

    python examples/search_serving.py [sf_dir] [work_dir]

Stages (SURVEY.md §8 operators): build_text_index (segmented postings,
partition-pruned search) → append a fresh batch of documents (exact,
no rebuild) → build_ivf_index → per-leg searches → rrf_fuse.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_search_serving"

    from pond_spark.functions.hybrid import rrf_fuse
    from pond_spark.functions.lexindex import build_text_index
    from pond_spark.session import get_spark
    from pond_spark.similarity.index import build_ivf_index

    spark = get_spark("search_serving")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # --- lexical leg: segmented postings index --------------------------
    head = docs.filter(F.col("doc_id") % 10 != 0)
    tail = docs.filter(F.col("doc_id") % 10 == 0)
    tix = build_text_index(head, f"{work}/text_index", n_buckets=64)
    tix.append(tail)  # exact incremental append — no rebuild
    terms = ["vector", "hash", "stream", "window"]
    print(f"BM25 over {tix.n_docs} docs, {len(tix.meta['segments'])} segments:")
    bm = tix.search(terms, k=10)
    bm.show()

    # --- vector leg: persisted IVF index --------------------------------
    vix = build_ivf_index(emb, f"{work}/ivf_index", n_centroids=16)
    query_vec = [(i % 7) / 7.0 for i in range(64)]
    vec = vix.search(query_vec, k=10, nprobe=4)
    print("IVF cosine top-10:")
    vec.show()

    # --- fusion: RRF over the two (id, rank) legs -----------------------
    bm_rank = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_q").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    vec_rank = vec.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .alias("rank"),
    )
    print("Hybrid RRF top-10 (rank_1 = BM25 leg, rank_2 = vector leg):")
    rrf_fuse([bm_rank, vec_rank], id_col="doc_id", k=10).show()


if __name__ == "__main__":
    main()
