"""SemDeDup — semantic deduplication via embedding clusters.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the corpus
embeddings, compute pairwise cosine only *within* each cluster, and
drop all but one member of every semantic-duplicate pair. Clustering
turns the O(N²) all-pairs problem into Σ O(|cluster|²) with |cluster|
≈ N/C — the same coarse-quantizer trick as IVF search, so this module
reuses the IVF trainer/assigner (similarity/ivf.py).

Scale notes (100 TB): the only shuffle is the within-cluster self-join
keyed on the cluster id. Cluster count must grow with the corpus
(SemDeDup uses ~√N; the paper runs 50k clusters for LAION-440M) so the
per-cluster quadratic term stays bounded — pass ``n_centroids``
accordingly. The join carries (id, vector) pairs; ids and scores only
after scoring. Hot clusters are the skew risk: AQE skew-join splits
oversized partitions, and a hard ``cluster_cap`` guard is available to
refuse degenerate clusterings. Assignment itself is a map-only JVM
expression (no Python, no shuffle) — see ivf._assign_expr.

Greedy keep rule: a vector is dropped iff a *lower-id* vector in the
same cluster matches at ≥ threshold — deterministic, order-free, and
one-pass declarative (the paper keeps a random member per duplicate
group; min-id is the reproducible choice).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.similarity.ivf import ivf_assign, train_centroids

__all__ = ["auto_n_centroids", "auto_cluster_cap", "semantic_pairs", "semantic_dedup"]


def auto_n_centroids(n_rows: int) -> int:
    """SemDeDup's scale rule: cluster count grows ~√N (the paper runs
    50k clusters for LAION-440M ≈ 2.4·√N). With C = √N clusters the
    within-cluster join does Σ(N/C)² = N·(N/C) ≈ N^1.5 total pair
    work per cluster-size unit — constant per-cluster cost as the
    corpus grows, instead of the quadratic blow-up of a fixed C."""
    return max(4, math.isqrt(max(n_rows - 1, 0)) + 1)


def auto_cluster_cap(n_rows: int, n_centroids: int) -> int:
    """Per-cluster size bound: 4× the balanced size N/C. A degenerate
    clustering (all mass in one centroid) would silently re-introduce
    the O(N²) self-join; the cap excludes such clusters from pairing
    instead (callers see fewer pairs, never a runaway shuffle)."""
    return max(16, 4 * -(-n_rows // max(n_centroids, 1)))


def semantic_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | None = None,
    iters: int = 5,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    cluster_cap: int | str | None = "auto",
) -> DataFrame:
    """Within-cluster semantic duplicate pairs.

    Returns ``(keep_id, drop_id, cluster, cosine)`` for every ordered
    pair (keep_id < drop_id) in the same cluster with cosine ≥
    ``threshold``; cosine rounded to 6 decimals for cross-engine
    hashing. ``cluster_cap`` drops clusters larger than the cap from
    pairing — the guard against a degenerate clustering re-introducing
    the quadratic blow-up.

    By default ``n_centroids`` follows the √N rule and ``cluster_cap``
    is 4× the balanced cluster size (see :func:`auto_n_centroids` /
    :func:`auto_cluster_cap`): the scale-safe configuration is the
    one you get without thinking. The one-off ``df.count()`` behind
    the auto rules is a cheap column-pruned aggregate, amortized
    against the O(N²/C) join it bounds; pass explicit values to skip
    it (e.g. when the caller already knows N).
    """
    if centroids is not None and n_centroids is None:
        n_centroids = len(centroids)
    if n_centroids is None or cluster_cap == "auto":
        n_rows = df.count()
        if n_centroids is None:
            n_centroids = auto_n_centroids(n_rows)
        if cluster_cap == "auto":
            cluster_cap = auto_cluster_cap(n_rows, n_centroids)
    if centroids is None:
        centroids = train_centroids(
            df, n_centroids, iters, sample_n, vec_col, id_col
        )
    assigned = ivf_assign(
        df.select(id_col, vec_col), centroids, vec_col, out_col="cluster"
    )
    if cluster_cap is not None:
        # window count, NOT a groupBy-sizes + join-back: a second
        # aggregate branch would re-run the (C dots per row) assignment
        # map over the whole table. The window shuffles once on
        # `cluster` — the exact partitioning the self-join below needs,
        # so Catalyst reuses the exchange instead of adding one.
        from pyspark.sql.window import Window

        assigned = (
            assigned.withColumn(
                "_csize",
                F.count(F.lit(1)).over(Window.partitionBy("cluster")),
            )
            .filter(F.col("_csize") <= cluster_cap)
            .drop("_csize")
        )
    # precompute each vector's norm ONCE before the self-join: pair
    # scoring then does a single dot per pair instead of dot + two
    # norm folds (3 array passes -> 1). dot/(na*nb) is the exact
    # operation tree of the oracle's round(dot/(norm(a)*norm(b)), 6),
    # so cross-engine hashes are unaffected.
    from pond_spark.similarity.brute import _dot, _norm, _safe_cos_div

    normed = assigned.withColumn("_nrm", _norm(F.col(vec_col)))
    a = normed.select(
        F.col("cluster"),
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = normed.select(
        F.col("cluster"),
        F.col(id_col).alias("drop_id"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    return (
        a.join(b, on="cluster")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .select(
            "keep_id",
            "drop_id",
            "cluster",
            F.round(
                _safe_cos_div(
                    _dot(F.col("_va"), F.col("_vb")),
                    F.col("_na") * F.col("_nb"),
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """Drop every vector that semantically duplicates a lower-id one.

    Two-phase like dedup_exact: pair generation (ids only in the
    shuffle) then a left-anti join back — the corpus rows themselves
    are never re-shuffled.
    """
    pairs = semantic_pairs(
        df, threshold, vec_col=vec_col, id_col=id_col, **kwargs
    )
    drops = pairs.select(F.col("drop_id").alias(id_col)).distinct()
    return df.join(drops, on=id_col, how="left_anti")
