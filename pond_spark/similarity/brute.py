"""Brute-force cosine similarity search over an embedding column.

The exact baseline: score every vector against the query with built-in
array expressions (``zip_with`` + ``aggregate`` — JVM-side, no Python),
then top-k via ``orderBy().limit(k)`` → TakeOrderedAndProject (per-
partition heaps, no global sort). This is the correct-by-construction
reference; the LSH/IVF variants in .lsh trade recall for candidate
pruning at scale.

Determinism: all arithmetic in double, summation strictly left-to-right
(``aggregate`` folds sequentially), results rounded to 6 decimals —
bit-compatible with the DuckDB oracle's identical fold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product, summed strictly left-to-right in double.

    With ``dim`` known the fold can be UNROLLED into a flat
    expression of ``dim`` multiply-adds. Measured (sf0.1, 64-dim,
    best-of-2 warm runs): the HOF fold beats the unrolled form ~3x at
    EVERY call site tried, including the 100k-pair knn_join broadcast
    cross — the flat 64-term tree inflates analysis/codegen and,
    stacked several times in one projection (cosine = dot + 2 norms;
    LSH planes; IVF centroids), blows Janino's 64 KB method limit and
    disables whole-stage codegen for the stage. Default to
    ``dim=None`` everywhere; ``dim`` stays supported for plan
    experiments. Both forms start from ``lit(0.0)`` and add terms in
    index order, so they are bit-identical to each other and to the
    DuckDB oracle's ``list_reduce``."""
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            x = F.get(a, i).cast("double")
            acc = acc + x * x
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _safe_cos_div(num: Column, den: Column) -> Column:
    """Cosine division guarded against zero-norm vectors: a zero
    embedding (failed/padded row) has no direction, so its cosine is
    NULL — under Spark 4's default ANSI mode the raw division ABORTS
    the job with DIVIDE_BY_ZERO, and with ANSI off it yields NaN,
    which both passes ``>= threshold`` filters and sorts FIRST in
    descending top-k order (r4 review). NULL does neither."""
    return F.when(den != F.lit(0.0), num / den)


def cosine_similarity(
    a: Column, b: Column, decimals: int = 6, dim: int | None = None
) -> Column:
    return F.round(
        _safe_cos_div(_dot(a, b, dim), _norm(a, dim) * _norm(b, dim)),
        decimals,
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query_vec``:
    ``(id, cosine)``, ties broken by id for determinism."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())  # zero-norm rows out
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


#: refuse to broadcast-cartesian a right side bigger than this many
#: rows (≈1M × 64-dim float ≈ 256 MB broadcast — already generous).
KNN_JOIN_MAX_RIGHT_ROWS = 1_000_000


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    max_right_rows: int = KNN_JOIN_MAX_RIGHT_ROWS,
    dim: int | None = None,
) -> DataFrame:
    """Exact k-NN join: for each left row, its k nearest right rows by
    cosine. The right side is broadcast and scored against every left
    row — exact by construction, and a deliberate scale-killer if the
    right side is large, so it REFUSES when ``right`` exceeds
    ``max_right_rows``. The guard is a limit-probe (count of
    ``limit(max+1)`` on the pruned id column), so it reads at most
    max+1 rows — it never full-scans a 100 TB right side just to
    refuse it. For large-vs-large, use lsh.embedding_near_pairs /
    lsh_topk / ivf_topk; to override knowingly, raise
    ``max_right_rows``."""
    from pyspark.sql.window import Window

    if right.select(right_id).limit(max_right_rows + 1).count() > max_right_rows:
        raise ValueError(
            f"knn_join right side exceeds max_right_rows={max_right_rows}: "
            "a broadcast cartesian at this size is a scale-killer. Use "
            "similarity.lsh.embedding_near_pairs / lsh_topk or "
            "similarity.ivf.ivf_topk for large right sides, or raise "
            "max_right_rows explicitly."
        )
    scored = cross_scores(
        left, right, vec_col, left_id, right_id, dim, guard=False
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def cross_scores(
    left: DataFrame,
    right: DataFrame,
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    dim: int | None = None,
    guard: bool = True,
    max_right_rows: int = KNN_JOIN_MAX_RIGHT_ROWS,
) -> DataFrame:
    """The broadcast cross-score frame ``(qid, nid, cosine)`` both
    knn_join and bitext_mine rank over — factored out so a consumer
    that needs BOTH directions (bitext's forward and backward k-NN)
    scores the symmetric matrix once instead of twice. Zero-norm rows
    (NULL cosine) are already filtered; cosines carry knn_join's
    6-decimal rounding."""
    if guard and (
        right.select(right_id).limit(max_right_rows + 1).count()
        > max_right_rows
    ):
        raise ValueError(
            f"cross_scores right side exceeds max_right_rows="
            f"{max_right_rows}: a broadcast cartesian at this size is a "
            "scale-killer. Use similarity.lsh / similarity.ivf candidates."
        )
    # hoist the norms out of the cross score: one norm per vector
    # instead of one per (query, neighbor) pair — identical value
    # (same fold over the same vector), 2/3 fewer flops in the join
    l = left.select(
        F.col(left_id).alias("qid"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col), dim).alias("_qn"),
    )
    r = right.select(
        F.col(right_id).alias("nid"),
        F.col(vec_col).alias("_nv"),
        _norm(F.col(vec_col), dim).alias("_nn"),
    )
    return (
        l.join(F.broadcast(r), F.lit(True))
        .select(
            "qid",
            "nid",
            F.round(
                _safe_cos_div(
                    _dot(F.col("_qv"), F.col("_nv"), dim),
                    F.col("_qn") * F.col("_nn"),
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())  # zero-norm rows out
    )
