"""IVF (inverted-file) approximate nearest neighbors — the
coarse-quantizer scale path next to the RHP-LSH variant.

Shape (classic IVF-Flat, e.g. the FAISS design): train C coarse
centroids on a bounded sample, assign every vector to its nearest
centroid (the "inverted list" id), and at query time score only the
``nprobe`` lists whose centroids are closest to the query.

Spark mapping:

- **train**: driver-side Lloyd iterations over a deterministic sample
  (smallest ids — reproducible, no RNG). IVF training is always
  sample-based; the sample is bounded (default 2048 rows) regardless of
  table size.
- **assign**: centroids are broadcast as literal arrays; the argmax
  over C cosines is a pure JVM expression — an array of (cos, cid)
  structs reduced with array_max (struct ordering compares fields
  left-to-right), no Python in the path. One narrow int column is
  appended; at 100 TB the assignment is a map-only stage writable as a
  partition/bucket column for list-local storage.
- **search**: centroid shortlist is computed driver-side (C is tiny);
  the probe filter prunes to ~nprobe/C of the table before any exact
  scoring; top-k via TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pond_spark.similarity.brute import cosine_similarity


def lloyd_centroids(x, n_centroids: int = 16, iters: int = 5) -> list[list[float]]:
    """Deterministic Lloyd iterations over a sample matrix (numpy,
    driver-side): init = first C rows, cosine assignment. Shared by
    the Spark trainer and the DuckDB oracle builder so both engines
    derive bit-identical centroids from the same sample."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 2 or len(x) == 0:
        # an empty sample would die deep in numpy with an opaque
        # AxisError; name the actual problem at the boundary
        raise ValueError(
            "lloyd_centroids: empty training sample — the input frame "
            "has no vectors to train on"
        )
    cent = x[:n_centroids].copy()
    for _ in range(iters):
        # cosine assignment: normalize then argmax dot
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = (xn @ cn.T).argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cent]


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic k-means: first ``sample_n`` vectors by id (IVF
    training is always sample-based and bounded regardless of table
    size), then ``iters`` Lloyd steps."""
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    return lloyd_centroids([r[1] for r in rows], n_centroids, iters)


def normalized_centroids(centroids: list[list[float]]) -> list[list[float]]:
    """Unit-normalize each centroid driver-side. argmax over
    ``dot(vec, ĉ)`` equals argmax over ``cosine(vec, c)`` (the row's
    own norm is a positive constant across centroids), so assignment
    needs ONE array pass per centroid instead of dot + two norm folds.
    Shared by the Spark assigner and the DuckDB oracle builders so
    both engines embed bit-identical literals."""
    import math

    out = []
    for c in centroids:
        n = math.sqrt(sum(float(v) * float(v) for v in c)) or 1.0
        out.append([float(v) / n for v in c])
    return out


def _assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax_c cosine(vec, centroid_c) as a JVM expression, scored as
    dot(vec, normalized centroid) — see normalized_centroids.

    NB measured (sf0.1, 32 centroids x 64 dims): keep the interpreted
    HOF dot here. Unrolling the dots into flat expressions makes
    n_centroids*dim terms in one projection, which exceeds Janino's
    64 KB generated-method limit — Spark disables whole-stage codegen
    for the stage and evaluates the giant tree interpreted, ~8x
    slower end-to-end (38.7 s vs 4.6 s for ann_ivf_topk).

    Plan-size discipline (round 3): the scoring is ONE ``transform``
    over a nested literal centroid array instead of n_centroids
    separate dot folds — identical arithmetic and fold order, but a
    constant number of lambda nodes instead of 2*n_centroids, which
    cuts Catalyst analysis of the assignment stage ~10x at √N-scaled
    centroid counts (semantic_pairs runs ~100 at sf0.1)."""
    from pond_spark.similarity.brute import _dot

    cents = F.array(
        *[
            F.array(*[F.lit(x) for x in c])
            for c in normalized_centroids(centroids)
        ]
    )
    scored = F.transform(
        cents,
        lambda c, i: F.struct(_dot(vec, c).alias("cos"), i.alias("cid")),
    )
    return F.array_max(scored).getField("cid")


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
) -> DataFrame:
    """Append the inverted-list id (nearest-centroid index)."""
    return df.withColumn(out_col, _assign_expr(F.col(vec_col), centroids))


def probe_lists(
    centroids: list[list[float]], query_vec: Sequence[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` inverted lists nearest the query (driver-side —
    C is tiny). Shared by ivf_topk and the oracle builder."""
    import numpy as np

    q = np.array(list(query_vec), dtype=np.float64)
    cn = np.array(centroids)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    return [int(i) for i in (cn @ qn).argsort()[::-1][:nprobe]]


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """ANN top-k scoring only the ``nprobe`` nearest inverted lists."""
    if centroids is None:
        centroids = train_centroids(
            df, n_centroids, iters, sample_n, vec_col, id_col
        )
    probes = probe_lists(centroids, query_vec, nprobe)

    assigned = ivf_assign(df, centroids, vec_col)
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.filter(F.col("ivf_list").isin(probes))
        .select(
            F.col(id_col), cosine_similarity(F.col(vec_col), qlit).alias("cosine")
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
