#!/usr/bin/env python3
"""Composed-pipeline stress: curate 10M synthetic docs through
quality → exact dedup → MinHash near-dedup (the r7 near_dedup stage)
in one run, with planted structure making the survivor count
predictable — the pipeline-level complement of tools/catalog_stress.py
(which stresses the cross-run catalogs in isolation).

Synthetic layout over ids ``[0, N)`` (12-word docs, 1M vocab):

- ids < 100k: one EXACT-dup hub (identical text) — exact_dedup must
  collapse it to the single min-id row;
- ids [100k, 500k): 200k planted NEAR-dup pairs — consecutive ids
  share 11 of 12 words (1-gram jaccard 11/13 ~= 0.846 >= the 0.8
  threshold); near_dedup must keep one min-id representative per pair
  (banded MinHash recall at these parameters misses ~1e-5 of pairs,
  so the assert is a tight range, and the exact survivor count is
  printed);
- the rest: fully unique docs — untouched by every stage (random
  >=11-of-12 word overlaps are effectively impossible from a 1M
  vocab).

Usage::

    python tools/pipeline_stress.py [n_docs]

Prints one JSON line ``PIPESTRESS {...}``. ~5-10 min at 10M on an
idle local[32].
"""

from __future__ import annotations

import json
import sys
import time

HUB = 100_000
NEAR_LO, NEAR_HI = 100_000, 500_000


def _synth_pipeline_docs(spark, n: int):
    from pyspark.sql import functions as F

    near = (F.col("id") >= NEAR_LO) & (F.col("id") < NEAR_HI)
    # content group for the 11 shared words
    sgrp = (
        F.when(F.col("id") < HUB, F.lit(0))
        .when(near, (F.col("id") - NEAR_LO) / 2 + 10_000_000)
        .otherwise(F.col("id"))
    ).cast("long")
    word = lambda seed_col, j: F.format_string(  # noqa: E731
        "w%d", F.pmod(F.xxhash64(seed_col, j), F.lit(1_000_000))
    )
    shared = F.transform(
        F.sequence(F.lit(0), F.lit(10)), lambda j: word(F.col("grp"), j)
    )
    # word 12: hub rows repeat the group word (exact dups); everything
    # else takes an id-unique word (near pairs differ ONLY here)
    last = F.when(F.col("id") < HUB, word(F.col("grp"), F.lit(11))).otherwise(
        word(F.col("id"), F.lit(999))
    )
    return (
        spark.range(n)
        .withColumn("grp", sgrp)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.concat(shared, F.array(last))).alias("text"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pond_spark.pipeline import CurationConfig, curate
    from pond_spark.session import get_spark

    spark = get_spark("pipeline_stress")
    docs = _synth_pipeline_docs(spark, n)
    config = CurationConfig(
        min_words=5,
        scrub_pii=False,
        stages=("quality", "exact_dedup", "near_dedup"),
        extra={
            "near_method": "minhash",
            "near_threshold": 0.8,
            "near_n": 1,
            "near_max_bucket": 1024,
        },
    )
    t0 = time.perf_counter()
    survivors = curate(docs, config, id_col="doc_id").count()
    wall = round(time.perf_counter() - t0, 1)

    n_pairs = (NEAR_HI - NEAR_LO) // 2
    expected_min = 1 + n_pairs + (n - HUB - (NEAR_HI - NEAR_LO))
    # each banded-recall miss keeps BOTH pair members (+1 each); allow
    # the ~1e-5 tail without letting a real regression hide
    slack = max(5, n_pairs // 10_000)
    ok = expected_min <= survivors <= expected_min + slack
    print(
        "PIPESTRESS "
        + json.dumps(
            {
                "n_docs": n,
                "survivors": survivors,
                "expected_min": expected_min,
                "recall_misses": survivors - expected_min,
                "wall_s": wall,
                "ok": ok,
            }
        ),
        flush=True,
    )
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
