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
    keep_id = min id. Groups with n_dups == 1 are unique documents.
    NULL-text rows are excluded — absent content proves no duplication
    (the corpus_profile rule; grouping them would fabricate one
    pseudo-dup group out of unrelated rows)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
        )
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "id"
) -> DataFrame:
    """Keep exactly the min-id row per distinct content. Two-phase:
    digest groupBy (narrow shuffle) then a semi-join back on
    (digest, id) — no full-row shuffle of the corpus. The digest is
    part of the join key on purpose: with non-unique ids, an id-only
    semi-join would keep EVERY row sharing a keeper's id — including
    duplicate content under a reused id (r4 review finding).

    NULL-text rows are each UNIQUE — absent content proves no
    duplication (the corpus_profile rule). Before the r7 review fix
    they were silently DELETED: sha2(NULL) is NULL, the groupBy pooled
    them into one keeper group, and the null-UNsafe semi-join equality
    then matched none of them. The rule is implemented branch-free by
    giving each NULL-text row a fabricated per-row digest in a
    namespace no real sha can collide with (non-hex ' null:' prefix +
    the id) — a filter/union split would instead DUPLICATE the
    upstream subtree in composed plans (measured +6 exchanges on the
    curation chain for a provably-empty branch). Rows where the id is
    ALSO NULL share one fabricated digest and collapse — ids are
    non-null by contract everywhere this runs."""
    digest = F.coalesce(
        F.sha2(F.col(text_col), 256),
        F.concat_ws("", F.lit(" null:"), F.col(id_col).cast("string")),
    )
    keepers = (
        df.select(digest.alias("_dedup_sha"), F.col(id_col))
        .groupBy("_dedup_sha")
        .agg(F.min(id_col).alias(id_col))
    )
    return (
        df.withColumn("_dedup_sha", digest)
        .join(keepers, on=["_dedup_sha", id_col], how="leftsemi")
        .drop("_dedup_sha")
    )


class DigestCatalog:
    """Cross-run incremental dedup: a persisted digest set the next
    batch anti-joins against — the production shape for CONTINUOUS
    corpus building, where "have we seen this document" must survive
    job restarts (the batch complement of streaming/dedup.py's
    watermark-bounded state).

    The catalog stores 32-byte digests only — at 100 TB of corpus it
    is ~0.03% of the data — and the anti-join shuffles digests, never
    documents. For repeated big-big runs, write the catalog bucketed
    by digest (sources/bucketing.py) so the anti-join co-locates
    without a shuffle.

    **Single-writer assumption**: filter_new → register is a
    read-then-append with no commit protocol, so exactly one pipeline
    may own a catalog path at a time (the normal shape: one scheduled
    corpus-build job per catalog). Two concurrent writers can both
    admit the same content in the window between their reads; if that
    happens the catalog ends up with a duplicate digest row — future
    runs still filter correctly (the anti-join doesn't care about
    multiplicity) but that window's batches overlap. Serialize
    writers externally (workflow scheduler / storage lease) when
    multiple pipelines must share one catalog.
    """

    def __init__(self, spark, path: str):
        from pond_spark.catalog import CatalogStore

        self.spark = spark
        self.path = path
        # persistence discipline (bootstrap / remnant-refusal /
        # crash-safe compact) lives once in pond_spark.catalog
        self._store = CatalogStore(
            spark, path, "content_sha string", "digest catalog"
        )

    def _read(self) -> DataFrame:
        return self._store.read()

    def filter_new(
        self, df: DataFrame, text_col: str = "text", id_col: str | None = None
    ) -> DataFrame:
        """Rows whose content digest is NOT in the catalog. Also
        drops within-batch duplicates (min-id keeper, keyed on
        ``id_col`` — defaults to the first column, so pass it
        explicitly when the id is not column 0) so one batch can't
        register the same digest twice."""
        id_col = id_col or df.columns[0]
        batch_unique = dedup_exact(df, text_col, id_col)
        digested = batch_unique.withColumn(
            "_sha", F.sha2(F.col(text_col), 256)
        )
        return (
            digested.join(
                self._read().withColumnRenamed("content_sha", "_sha"),
                "_sha",
                "left_anti",
            )
            .drop("_sha")
        )

    def register(
        self, df: DataFrame, text_col: str = "text",
        run_ts: int | None = None,
    ) -> None:
        """Append the batch's distinct digests to the catalog.
        NULL-text rows contribute nothing — a NULL digest matches no
        future probe (filter_new's anti-join is null-unsafe), so
        storing it would only pad the catalog. ``run_ts`` backdates
        the registration stamp (replays; the retention axis —
        see :meth:`expire`)."""
        self._store.append(
            df.filter(F.col(text_col).isNotNull())
            .select(F.sha2(F.col(text_col), 256).alias("content_sha"))
            .distinct(),
            run_ts=run_ts,
        )

    def compact(self) -> None:
        """Rewrite the catalog as one distinct digest set: every
        ``register`` appends its own files (and concurrent-writer
        races can leave duplicate digests — see class docstring), so a
        long-lived catalog accumulates small files and dup rows that
        cost every future anti-join. Same single-writer rule as
        register. Crash-safe double rename; a crash mid-swap leaves
        the ``._old`` remnant ``_read`` refuses to bootstrap over
        (see pond_spark.catalog)."""
        self._store.compact()

    def expire(self, before_ts: int) -> dict:
        """Age-evict digests registered before ``before_ts`` (epoch
        seconds) — the reference's max_age discipline
        (src/Instance.cxx:190-203) applied to the gate store: without
        it a year of daily runs leaves an unbounded catalog. Evicted
        content re-admits (and re-registers with a fresh stamp) on its
        next appearance. Compaction-integrated and sidecar-recorded;
        see CatalogStore.expire."""
        return self._store.expire(before_ts)

    def retention_history(self) -> list[dict]:
        """Recorded evictions, oldest first."""
        return self._store.stats_history(suffix=".retention.jsonl")
