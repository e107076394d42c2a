"""Continuous corpus building: documents arrive as files, each
micro-batch runs the FULL batch curation chain via ``foreachBatch``,
cross-batch (and cross-restart) exact dedup goes through the persisted
DigestCatalog, and the curated stream lands as parquet that a final
batch step packs into token-budget shards.

    python examples/stream_curation.py [sf_dir] [work_dir]

The demo stages three arriving batches where batch 2 re-delivers half
of batch 1 — the catalog gate drops the re-deliveries even though they
arrive in a different micro-batch (and would survive a job restart).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_stream_curation"

    from pond_spark.functions.text import token_count
    from pond_spark.operators.packing import pack_shards
    from pond_spark.pipeline import CurationConfig, curate_foreach_batch
    from pond_spark.session import get_spark

    spark = get_spark("stream_curation")
    src = f"{work}/arrivals"
    out = f"{work}/curated"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # three arriving files; the third re-delivers part of the first
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    docs.filter(F.col("doc_id") % 4 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def writer(batch_df, batch_id):
        n = batch_df.count()
        print(f"batch={batch_id} curated_rows={n}", flush=True)
        if n:
            batch_df.write.mode("append").parquet(out)

    apply_batch = curate_foreach_batch(
        writer,
        CurationConfig(min_words=10, stages=("quality", "exact_dedup",
                                             "line_dedup", "pii")),
        digest_catalog_path=f"{work}/digest_catalog",
    )
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    curated = spark.read.parquet(out)
    packed = pack_shards(
        curated.withColumn("n_tokens", token_count(F.col("text"))),
        budget=4096,
    )
    shards = packed.select("shard").distinct().count()
    print(
        f"curated {curated.count()} docs into {shards} shards "
        f"(re-delivered batch contributed 0 — catalog-gated)"
    )


if __name__ == "__main__":
    main()
