"""N-gram Jaccard near-duplicate pairs with key blocking.

The oracle-checkable member of the near-dup family: exact Jaccard over
distinct token n-gram sets, restricted to candidate pairs sharing a
blocking key (e.g. language) so the self-join is block-local instead of
O(n²) global. For unblocked discovery at scale, use minhash_lsh_pairs —
same verify step, LSH candidates instead of blocks.

Scale notes: the self-join shuffles on the blocking key; block sizes
bound the quadratic term, and AQE skew-join splits oversized blocks.
Token arrays are computed once per side before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.8,
    n: int = 1,
) -> DataFrame:
    """Pairs ``(id_a, id_b, jaccard)``, id_a < id_b, jaccard >= τ."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    if n == 1:
        grams = toks
    else:
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    base_cols = [F.col(id_col), F.array_distinct(grams).alias("_grams")]
    if block_col:
        base_cols.append(F.col(block_col).alias("_blk"))
    base = df.select(*base_cols)

    left = base.select(
        F.col(id_col).alias("id_a"),
        F.col("_grams").alias("_ga"),
        *([F.col("_blk")] if block_col else []),
    )
    right = base.select(
        F.col(id_col).alias("id_b"),
        F.col("_grams").alias("_gb"),
        *([F.col("_blk")] if block_col else []),
    )
    joined = (
        left.join(right, on="_blk") if block_col else left.crossJoin(right)
    ).filter(F.col("id_a") < F.col("id_b"))

    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size("_ga").cast("double") + F.size("_gb").cast("double") - inter
    return (
        joined.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
