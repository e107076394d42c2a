from pond_spark.similarity.brute import brute_force_topk, cosine_similarity
from pond_spark.similarity.catalog import EmbeddingCatalog, GateOvershootError
from pond_spark.similarity.ivf import ivf_assign, ivf_topk, train_centroids
from pond_spark.similarity.lsh import embedding_near_pairs, lsh_topk, rhp_bucket
from pond_spark.similarity.pq import pq_encode, pq_topk, train_pq

__all__ = [
    "cosine_similarity",
    "brute_force_topk",
    "EmbeddingCatalog",
    "GateOvershootError",
    "rhp_bucket",
    "lsh_topk",
    "embedding_near_pairs",
    "train_centroids",
    "ivf_assign",
    "ivf_topk",
    "train_pq",
    "pq_encode",
    "pq_topk",
]
