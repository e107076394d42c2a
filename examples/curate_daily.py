"""Daily incremental corpus curation — the cross-RUN shape of
examples/curate_resumable.py: one work_dir per day, one shared
DigestCatalog across days, so each day's run processes only content no
prior day saw (pipeline.curate_run with digest_catalog_path,
late-r8 / round-9 #3).

    python examples/curate_daily.py [sf_dir] [base_dir]

The script simulates three daily arrivals from the documents table:

1. day 1 — a slice of the corpus; everything is new, the run registers
   the digests of everything it SAW (its gate survivors) after the
   final stage succeeds;
2. day 2 — a slice that OVERLAPS day 1 (the upstream crawler re-fetched
   half of yesterday); the catalog_gate drops the overlap before any
   curation compute touches it;
3. day 2 re-run — every stage (and the registration) reports
   ``resumed``: a scheduler can blindly re-invoke the same command.

Each run holds a writer lease (``lease_ttl=``) on the work_dir and
the catalog, so a scheduler double-FIRE (two overlapping invocations,
as opposed to the sequential retry above) refuses with LeaseHeldError
instead of racing the read-then-append catalog.

The gate's scale story: the anti-join ships 32-byte digests only,
never documents — at 100 TB/day the catalog is ~0.03% of the corpus.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_curate_daily"

    from pond_spark.pipeline import (
        CurationConfig,
        curate_run,
        final_corpus_path,
    )
    from pond_spark.session import get_spark

    spark = get_spark("curate_daily")
    config = CurationConfig(
        min_words=10, stages=("quality", "exact_dedup", "pii")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # day 1 = ids [0, 2/3); day 2 = ids [1/3, 1) — the middle third is
    # the crawler's re-fetch that the gate must drop on day 2
    hi = docs.selectExpr("max(doc_id) AS m").collect()[0].m or 0
    day1_path, day2_path = f"{base}/in_day1", f"{base}/in_day2"
    docs.filter(f"doc_id < {2 * hi // 3}").write.mode("overwrite").parquet(
        day1_path
    )
    docs.filter(f"doc_id >= {hi // 3}").write.mode("overwrite").parquet(
        day2_path
    )
    catalog = f"{base}/digest_catalog"

    def show(tag: str, rows: list[dict]) -> None:
        print(f"--- {tag}")
        for r in rows:
            print(f"  {r['status']:8s} {r['stage']:16s} -> {r['path']}")
        final = final_corpus_path(rows)
        print(f"  shipped rows: {spark.read.parquet(final).count()}")

    show(
        "day 1",
        curate_run(
            spark, day1_path, f"{base}/day1", config,
            digest_catalog_path=catalog, lease_ttl=600,
        ),
    )
    show(
        "day 2 (overlap gated)",
        curate_run(
            spark, day2_path, f"{base}/day2", config,
            digest_catalog_path=catalog, lease_ttl=600,
        ),
    )
    show(
        "day 2 re-run (scheduler retry)",
        curate_run(
            spark, day2_path, f"{base}/day2", config,
            digest_catalog_path=catalog, lease_ttl=600,
        ),
    )
    print(f"catalog digests: {spark.read.parquet(catalog).count()}")

    # --- operations view (round 9): the cross-run funnel from the
    # persisted stage outputs — input -> gate drops -> stage drops ->
    # shipped per day, no recomputation
    from pond_spark.pipeline import report_runs

    print("--- funnel (pipeline.report_runs)")
    for day in report_runs(spark, [f"{base}/day1", f"{base}/day2"]):
        print(
            f"  {day['work_dir']}: in={day['input_rows']} "
            f"shipped={day['shipped_rows']} "
            f"registered={day['registered']}"
        )
        for s in day["stages"]:
            print(f"    {s['stage']:16s} out={s['rows_out']} "
                  f"dropped={s['dropped']}")

    # --- retention (round 9): the reference's max_age discipline on
    # the gate store — evict everything registered so far, and the
    # same content re-admits (it would re-register on its next run)
    from pond_spark.dedup.exact import DigestCatalog

    cat = DigestCatalog(spark, catalog)
    rec = cat.expire(before_ts=2**62)  # horizon far in the future
    print(
        f"--- retention: expire kept {rec['rows_kept']} of "
        f"{rec['rows_before']} digests"
    )
    readmitted = cat.filter_new(spark.read.parquet(day1_path)).count()
    print(f"  day-1 content re-admitted after eviction: {readmitted} rows")


if __name__ == "__main__":
    main()
