"""Tokenizer-aware training-sequence preparation: learn a BPE merge
chain, tokenize the corpus, pack WHOLE documents into fixed-capacity
training sequences (no truncation), and write one parquet per
sequence-bucket — the packed-dataset step after curation.

    python examples/tokenize_and_pack.py [sf_dir] [out_dir]

Stages (each an operator documented in SURVEY.md §8):
BPE induction (functions/bpe.bpe_train) → corpus tokenization on the
distinct-word frame (bpe_segment) → per-doc piece counts →
first-fit-decreasing sequence packing (operators/seqpack) → manifest
out, with the fill/waste report a capacity-planning run reads.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pond_packed"

    from pond_spark.functions.bpe import bpe_segment, bpe_train
    from pond_spark.operators.seqpack import pack_sequences
    from pond_spark.session import get_spark

    spark = get_spark("tokenize_and_pack")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )

    merges = [
        (r.left, r.right)
        for r in bpe_train(docs, n_merges=24).orderBy("rank").collect()
    ]
    per_doc = (
        bpe_segment(docs, merges)
        .groupBy("doc_id")
        .agg(F.sum(F.size("pieces")).cast("long").alias("n_tokens"))
    )
    packed = pack_sequences(per_doc, capacity=512, n_buckets=16)
    (
        packed.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )

    manifest = spark.read.parquet(out)
    report = manifest.groupBy("bucket", "bin").agg(
        F.sum("n_tokens").alias("fill")
    )
    stats = report.agg(
        F.count(F.lit(1)).alias("sequences"),
        F.avg("fill").alias("avg_fill"),
    ).collect()[0]
    print(
        f"packed {manifest.count()} docs into {stats.sequences} sequences "
        f"(avg fill {stats.avg_fill:.1f}/512 tokens) at {out}"
    )


if __name__ == "__main__":
    main()
