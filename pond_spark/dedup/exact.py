"""Exact deduplication (north-star: training-data pipeline op).

Scale notes: grouping by a 64-bit/256-bit digest of the content instead
of the content itself keeps the shuffle narrow (16-32 B keys, not
multi-KB documents); the canonical-keeper rule (min id) makes the
result deterministic and idempotent. At 100 TB the digest groupBy is a
single hash-partitioned shuffle with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content value: ``(keep_id, n_dups)`` with
    keep_id = min id. Groups with n_dups == 1 are unique documents."""
    return df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "id"
) -> DataFrame:
    """Keep exactly the min-id row per distinct content. Two-phase:
    digest groupBy (narrow shuffle) then a semi-join back on
    (digest, id) — no full-row shuffle of the corpus."""
    keepers = (
        df.select(F.sha2(F.col(text_col), 256).alias("_sha"), F.col(id_col))
        .groupBy("_sha")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keepers, on=id_col, how="leftsemi")
