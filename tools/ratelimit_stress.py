#!/usr/bin/env python3
"""Per-site rate-limit 10M-row stress (VERDICT r7 ask #7).

The token bucket (T6: sources/ingest.py batch path,
streaming/ratelimit.py live path) was the last §2 operator family with
no scale measurement above sf0.1. This drives both paths at the regime
they were designed for — 10M events across 100k sites — and records
what the design predicts:

- STREAM leg: 10 one-million-row triggers through
  ``rate_limit_stream`` (applyInPandasWithState). State is exactly one
  (tokens, last_us) pair per site, so ``numRowsTotal`` must equal the
  site count and stay FLAT across triggers (the bound is sites, not
  events); per-trigger wall cost is reported at two state-partition
  sizings — at 1M-row triggers the per-partition state-store fixed
  cost that dominates TINY batches (PERF_NOTES r7 addendum) should be
  amortized, i.e. the parts=32 vs parts=8 gap should be small, the
  opposite regime of the small-batch study.
- BATCH leg: ``sources.ingest.rate_limit`` over the same 10M rows in
  one pass (the replay used by ingest_batch and q:stats) — wall time
  for the full fold.

Synthetic layout: ids dense ``[0, n)``, ``site = s{id % n_sites}``,
~5/7 of rows are the charged message type (modulus coprime with the
site count so every site is charged), timestamps sweep one minute so
the per-site charged volume (~70 rows at the defaults) far outruns the
refill (rate 0.5/s, burst 5) and both accept and discard branches run
hot.

Usage::

    python tools/ratelimit_stress.py [n_rows] [n_sites]

Prints one JSON line ``RLSTRESS {...}``. Run on an idle host;
~5-10 min at the default 10M/100k.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get_spark():
    from pond_spark.session import get_spark

    return get_spark("ratelimit_stress")


def _synth(spark, n: int, n_sites: int, path: str, files: int) -> None:
    from pyspark.sql import functions as F

    per = n // files
    for i in range(files):
        df = (
            spark.range(i * per, (i + 1) * per, 1, 8)
            .withColumn("site", F.concat(F.lit("s"), F.pmod("id", F.lit(n_sites))))
            .withColumn(
                # modulus 7 is coprime with the site counts used here —
                # a site-divisible modulus would starve some sites of
                # charged rows entirely (measured: 800/1000 sites)
                "type",
                F.when(F.pmod("id", F.lit(7)) < 5, F.lit("http_error"))
                .otherwise(F.lit("http_access")),
            )
            .withColumn(
                "timestamp",
                F.timestamp_micros(
                    F.lit(1_709_280_000_000_000)
                    + (F.col("id") % F.lit(60)) * F.lit(1_000_000)
                ),
            )
        )
        df.coalesce(1).write.mode("append").parquet(path)


def _stream_leg(spark, src: str, root: str, parts: int) -> dict:
    from pond_spark.streaming.ratelimit import rate_limit_stream

    sdf = (
        spark.readStream.schema(
            "id long, site string, type string, timestamp timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = rate_limit_stream(
        sdf, rate=0.5, burst=5.0, message_type="http_error",
        state_partitions=parts,
    )
    counts = []

    def sink(df, _bid):
        # unconditionally materialize EVERY partition — Spark 4's
        # state-store commit tracker kills the stream otherwise
        counts.append(df.count())

    ckpt = os.path.join(root, f"ckpt_{parts}")
    t0 = time.perf_counter()
    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progs = [p for p in q.recentProgress if int(p.get("numInputRows", 0)) > 0]
    trig_ms = [int(p["durationMs"]["triggerExecution"]) for p in progs]
    state = [
        (
            int(p["stateOperators"][0]["numRowsTotal"]),
            int(p["stateOperators"][0].get("memoryUsedBytes", 0)),
        )
        for p in progs
        if p.get("stateOperators")
    ]
    return {
        "parts": parts,
        "wall_s": round(wall, 1),
        "triggers": len(progs),
        "rows": sum(counts),
        "trigger_p50_s": round(statistics.median(trig_ms) / 1000, 2)
        if trig_ms
        else None,
        "trigger_max_s": round(max(trig_ms) / 1000, 2) if trig_ms else None,
        "state_rows_final": state[-1][0] if state else None,
        "state_rows_flat": len({s[0] for s in state[2:]}) <= 1
        if len(state) > 3
        else None,
        "state_mb_final": round(state[-1][1] / 1e6, 1) if state else None,
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = _get_spark()
    root = tempfile.mkdtemp(prefix="pond_rl_stress_")
    try:
        src = os.path.join(root, "events")
        t0 = time.perf_counter()
        _synth(spark, n, n_sites, src, files=10)
        gen_s = round(time.perf_counter() - t0, 1)

        stream_default = _stream_leg(spark, src, root, parts=32)
        stream_sized = _stream_leg(spark, src, root, parts=8)

        # batch leg: one-pass replay over all 10M rows
        from pond_spark.sources.ingest import rate_limit

        logs = spark.read.parquet(src)
        t0 = time.perf_counter()
        flagged = rate_limit(logs, rate=0.5, burst=5.0)
        n_discarded = flagged.filter("_discarded").count()
        batch_s = round(time.perf_counter() - t0, 1)

        report = {
            "n_rows": n,
            "n_sites": n_sites,
            "gen_s": gen_s,
            "stream_parts32": stream_default,
            "stream_parts8": stream_sized,
            "batch_fold_s": batch_s,
            "batch_discarded": n_discarded,
        }
        print("RLSTRESS " + json.dumps(report))
        # invariants the design promises
        assert stream_default["rows"] == n
        assert stream_default["state_rows_final"] == n_sites
        assert stream_sized["state_rows_final"] == n_sites
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
