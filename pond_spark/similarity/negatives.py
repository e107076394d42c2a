"""Hard-negative mining for contrastive training — pair every vector
with ``k`` same-cluster neighbors: cluster co-membership under the IVF
coarse quantizer is the standard cheap proxy for "semantically close
but not identical", which is exactly what contrastive objectives want
as negatives (e.g. the in-batch/ANN-negative recipes of DPR, Karpukhin
et al. 2020 §3.2).

Reuses the deterministic IVF trainer/assigner (similarity/ivf.py), so
the mining is reproducible and the DuckDB oracle twin derives
bit-identical clusters. Pairing is a per-cluster window ``lead`` over
the id order — deterministic, no RNG, no self-pairs — so re-runs and
engines agree row-for-row.

Shape: assignment is map-only (centroid literals); the pairing is ONE
window shuffle keyed on the cluster id. At 100 TB with √N-scaled
centroids each cluster is ~√N rows — far under a task's memory — and
the output is ids-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pond_spark.similarity.ivf import ivf_assign, train_centroids


def hard_negative_pairs(
    df: DataFrame,
    k: int = 2,
    n_centroids: int = 16,
    iters: int = 5,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """``(anchor_id, negative_id, cluster, offset)`` — for each anchor,
    the next ``k`` ids in its cluster (id order, offset 1..k). Anchors
    near the end of their cluster emit fewer pairs; no wrap-around, so
    every pair appears exactly once per direction."""
    if centroids is None:
        centroids = train_centroids(
            df, n_centroids, iters, sample_n, vec_col, id_col
        )
    assigned = ivf_assign(df, centroids, vec_col, out_col="cluster").select(
        F.col(id_col).alias("anchor_id"), "cluster"
    )
    w = Window.partitionBy("cluster").orderBy("anchor_id")
    pairs = assigned.select(
        "anchor_id",
        "cluster",
        *[
            F.lead("anchor_id", i).over(w).alias(f"_n{i}")
            for i in range(1, k + 1)
        ],
    )
    stacked = pairs.select(
        "anchor_id",
        "cluster",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"_n{i}").alias("negative_id"),
                        F.lit(i).alias("offset"),
                    )
                    for i in range(1, k + 1)
                ]
            )
        ).alias("_p"),
    )
    return stacked.select(
        "anchor_id", F.col("_p.negative_id"), "cluster", F.col("_p.offset")
    ).filter(F.col("negative_id").isNotNull())
