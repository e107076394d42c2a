"""Resumable corpus curation — the multi-day 100 TB shape of
examples/curate_corpus.py (which is single-shot): every stage
materializes to the work_dir, and re-running the SAME command after a
crash or a deliberate stop resumes from the first incomplete stage
instead of recomputing the chain.

    python examples/curate_resumable.py [sf_dir] [work_dir]

The script demonstrates the full lifecycle in one process:

1. first run — every stage reports ``computed``;
2. re-run — every stage reports ``resumed`` (no recompute);
3. simulated crash — a middle stage's ``_SUCCESS`` marker is removed,
   and the third run recomputes exactly from that stage while earlier
   outputs stay untouched; determinism (hash sampling, min-id
   representatives) makes the recomputed corpus identical.

Config changes refuse the work_dir (manifest pin) — start a new
work_dir per run definition.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_curate_run"

    from pond_spark.pipeline import CurationConfig, curate_run
    from pond_spark.session import get_spark

    spark = get_spark("curate_resumable")
    config = CurationConfig(
        min_words=10,
        sample_rate=0.5,
        stages=("quality", "exact_dedup", "pii", "sample"),
    )
    docs = f"{sf_dir}/documents.parquet"

    def show(tag: str, rows: list[dict]) -> None:
        print(f"--- {tag}")
        for r in rows:
            print(f"  {r['status']:8s} {r['stage']:12s} -> {r['path']}")

    show("run 1 (fresh)", curate_run(spark, docs, work, config))
    show("run 2 (resume)", r2 := curate_run(spark, docs, work, config))

    # simulate a crash that lost stage 2 mid-write
    victim = r2[2]["path"]
    os.remove(os.path.join(victim, "_SUCCESS"))
    print(f"--- removed {victim}/_SUCCESS (simulated crash)")
    show("run 3 (partial resume)", r3 := curate_run(spark, docs, work, config))

    final = spark.read.parquet(r3[-1]["path"])
    print(f"curated rows: {final.count()}")


if __name__ == "__main__":
    main()
