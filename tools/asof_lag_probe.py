#!/usr/bin/env python3
"""stream_asof close-lag attribution (VERDICT r8 ask #6): the sized
close-lag BENCH row (~6 s at state_partitions=4) was attributed to
"file discovery + closing-pair cadence" in prose — this probe measures
the split instead of asserting it.

It replays the bench probe's exact setup (seed pair, horizon 1900 s,
three watermark-advancing closing pairs) and, after the triggered row
lands, reads ``query.recentProgress`` for every micro-batch between
the closing write and delivery, aggregating Spark's own
``durationMs`` phases:

- ``latestOffset`` + ``getBatch``  -> file-source discovery/listing
- ``addBatch``                     -> the chained stateful operators
  (join state + window carry) — the real work
- ``triggerExecution``             -> total per trigger (the rest is
  planning/WAL/commit overhead)

Two legs:

1. ``throttled``  — the bench configuration (right stream
   maxFilesPerTrigger=1): each closing right file needs its OWN
   trigger, so delivery waits for >= 3 trigger roundtrips by
   construction.
2. ``unthrottled`` — same data, right stream without the throttle:
   the closing files coalesce into fewer triggers; the difference is
   the pure trigger-cadence share of the lag.

Usage::

    python tools/asof_lag_probe.py [sf_dir]

Prints one ``ASOFLAG {...}`` JSON line per leg.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(spark, sf_dir: str, throttle_right: bool) -> dict:
    from pyspark.sql import functions as F

    from __spark_entry__ import events_as_logs
    from pond_spark.streaming.asof import asof_join_stream
    from pond_spark.streaming.conf import SHUFFLE_PARTITIONS_CONF
    from pond_spark.streaming.follow import continue_stream

    ldir = tempfile.mkdtemp(prefix="pond_asoflag_l_")
    rdir = tempfile.mkdtemp(prefix="pond_asoflag_r_")
    ckpt = tempfile.mkdtemp(prefix="pond_asoflag_ck_")
    h_open = dt.datetime(2024, 1, 1, 0, 30, 0)
    seed = events_as_logs(spark, sf_dir).limit(256).withColumn(
        "site", F.lit("_lagprobe")
    ).withColumn("timestamp", F.lit(h_open))
    seed.coalesce(1).write.mode("append").parquet(ldir)
    rsch = "site string, timestamp timestamp, cfg string"
    spark.createDataFrame(
        [("_lagprobe", dt.datetime(2024, 1, 1, 0, 0, 0), "v1")], rsch
    ).coalesce(1).write.mode("append").parquet(rdir)

    history_done = threading.Event()
    hit = threading.Event()
    t_hit: list[float] = []
    t0_box: list[float] = [float("inf")]

    def sink(df, _bid: int) -> None:
        n_hit = df.filter(
            (df.site == "_lagprobe")
            & (df.timestamp == h_open)
            & df.cfg.isNotNull()
        ).count()
        if n_hit > 0 and time.perf_counter() > t0_box[0]:
            t_hit.append(time.perf_counter())
            hit.set()
        history_done.set()

    right = spark.readStream.schema(rsch)
    if throttle_right:
        right = right.option("maxFilesPerTrigger", "1")
    right = right.parquet(rdir)
    prev_parts = spark.conf.get(SHUFFLE_PARTITIONS_CONF)
    q = (
        asof_join_stream(
            continue_stream(spark, ldir, watermark=None),
            right,
            ["site"],
            horizon_seconds=1900,
            state_partitions=4,
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    spark.conf.set(SHUFFLE_PARTITIONS_CONF, prev_parts)
    try:
        if not history_done.wait(timeout=300):
            raise RuntimeError("backfill never drained")
        # wall-clock batch timestamps are in recentProgress; remember
        # where the closing write happened
        t0_box[0] = time.perf_counter()
        t0_wall = time.time()
        for m in (65, 70, 75):
            later = dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)
            seed.limit(1).withColumn("site", F.lit("_zz")).withColumn(
                "timestamp", F.lit(later)
            ).coalesce(1).write.mode("append").parquet(ldir)
            spark.createDataFrame([("_zz", later, "vx")], rsch).coalesce(
                1
            ).write.mode("append").parquet(rdir)
        if not hit.wait(timeout=300):
            raise RuntimeError("closing row never delivered")
        lag = round(t_hit[0] - t0_box[0], 3)
        time.sleep(1)  # let the last progress event flush
        phases = {"latestOffset": 0, "getBatch": 0, "addBatch": 0,
                  "triggerExecution": 0}
        n_batches = 0
        for p in q.recentProgress:
            # progress timestamps are ISO-8601 UTC; keep batches that
            # STARTED after the closing write (minus one trigger of
            # slack for the in-flight one)
            ts = dt.datetime.strptime(
                p["timestamp"], "%Y-%m-%dT%H:%M:%S.%fZ"
            ).replace(tzinfo=dt.timezone.utc).timestamp()
            if ts < t0_wall - 0.5:
                continue
            n_batches += 1
            for k in phases:
                phases[k] += p.get("durationMs", {}).get(k, 0)
        return {
            "leg": "throttled" if throttle_right else "unthrottled",
            "close_lag_s": lag,
            "n_batches_after_close": n_batches,
            "ms_listing": phases["latestOffset"] + phases["getBatch"],
            "ms_state_ops": phases["addBatch"],
            "ms_trigger_total": phases["triggerExecution"],
        }
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(ldir, ignore_errors=True)
        shutil.rmtree(rdir, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pond_spark.session import get_spark

    spark = get_spark("asof_lag_probe")
    for throttle in (True, False):
        for _ in range(2):  # best-of-2 like the bench rows
            rep = run_leg(spark, sf_dir, throttle)
            print("ASOFLAG " + json.dumps(rep), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
