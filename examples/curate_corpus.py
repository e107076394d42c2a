"""End-to-end corpus curation: raw documents in, training-ready
shards out — the composed pipeline a training-data team would run.

    python examples/curate_corpus.py [sf_dir] [out_dir]

Stages (each an operator documented in SURVEY.md §8):
quality gate → exact dedup → NEAR dedup (MinHash-LSH clusters, min-id
representative) → line dedup → PII scrub → decontaminate →
temperature-balanced language mixture → token-budget shard packing →
per-shard parquet out, with the report() funnel audit printed first.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_curated"

    from pond_spark.functions.text import token_count
    from pond_spark.operators.packing import pack_shards
    from pond_spark.operators.sampling import temperature_mixture
    from pond_spark.pipeline import CurationConfig, curate, report
    from pond_spark.session import get_spark

    spark = get_spark("curate_corpus")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    eval_set = docs.orderBy("doc_id").limit(5)  # stand-in benchmark set
    config = CurationConfig(
        min_words=10,
        stages=(
            "quality", "exact_dedup", "near_dedup", "line_dedup",
            "pii", "decontaminate", "sample",
        ),
        extra={"near_threshold": 0.85, "near_n": 3,
               "near_max_bucket": 1024},
    )
    for r in report(docs, config, eval_set=eval_set):
        print(
            f"stage={r['stage']} rows_in={r['rows_in']} "
            f"rows_out={r['rows_out']}"
        )
    curated = curate(docs, config, eval_set=eval_set)
    balanced = temperature_mixture(curated, alpha=0.7, source_col="lang")
    packed = pack_shards(
        balanced.withColumn("n_tokens", token_count(F.col("text"))),
        budget=4096,
    )
    (
        packed.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out)
    )
    n = spark.read.parquet(out).count()
    shards = spark.read.parquet(out).select("shard").distinct().count()
    print(f"curated {n} rows into {shards} shards at {out}")


if __name__ == "__main__":
    main()
