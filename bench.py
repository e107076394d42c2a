"""Benchmark runner: executes the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Execution is measured end-to-end per query with a ``noop``-format write
so the full plan runs (scan → shuffle → sink) without driver-side
collection skewing the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entrymod
    from pond_spark.session import get_spark

    spark = get_spark("pond_spark_bench")

    qs = entrymod.queries()
    contract = set(qs)
    # bench-only probes (approx stage of the recall harnesses, timed
    # alone); reported per-query but excluded from the headline total
    # so round-over-round totals compare the same contract surface
    qs.update(getattr(entrymod, "bench_queries", dict)())
    # warm the JVM + parquet footers once with the cheapest query
    try:
        qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass
    # warm the Python/Arrow worker pool so the first Pandas-UDF query
    # isn't charged the fork + numpy-import cost
    try:
        import pandas as _pd

        def _noop(it):
            for pdf in it:
                yield pdf

        spark.range(32).repartition(32).mapInPandas(
            _noop, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    # host-episode calibration (VERDICT r8 #4, measured r9): this host
    # shows multi-MINUTE noise episodes where sub-second rows run
    # 3-12x slow — within-row resampling can't reject an episode that
    # outlives the row. A fixed JVM-codegen micro-probe (range+sum,
    # no IO) is timed before each noise-sensitive sample; a sample
    # attempted while the probe runs >1.6x the reference baseline is
    # DISCARDED as a host artifact (bounded retries so a sustained
    # episode degrades to the old behavior instead of hanging).
    #
    # The reference is min(session-start baseline, ABSOLUTE baseline
    # from BASELINE_CAL.json) — VERDICT r10 #1: a session-relative
    # baseline alone is blind to an episode that already spans session
    # start (it inflates cal_base itself ~1.4x, so the 1.6x discard
    # never fires; that is exactly how BENCH_r10 shipped a uniform
    # phantom regression). The absolute number is the healthy
    # session-start min-of-3 measured on this host class at idle; on
    # a healthy session the session base is at or below it and
    # nothing changes, while an episode-contaminated session falls
    # back to the absolute reference and discards correctly. All
    # calibration facts are EMITTED in the bench JSON so a
    # contaminated run is machine-detectable post-hoc.
    def _calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(30_000_000).selectExpr("sum(id % 97)").collect()
        return time.perf_counter() - t0

    cal_abs = None
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_CAL.json")
        ) as f:
            cal_abs = float(json.load(f)["cal_abs_sec"])
    except Exception:  # noqa: BLE001 — missing file: session-only guard
        pass
    cal_session = min(_calibrate() for _ in range(3))
    cal_base = min(cal_session, cal_abs) if cal_abs else cal_session
    calibration = {
        "cal_abs_sec": cal_abs,
        "cal_session_sec": round(cal_session, 4),
        "cal_ref_sec": round(cal_base, 4),
        # session start already inside an episode: the r10 blind spot
        "episode_suspect": bool(cal_abs and cal_session > 1.3 * cal_abs),
        "discards": {},
        "n_discards": 0,
        "probe_max_sec": 0.0,
    }

    times: dict[str, float] = {}
    for name, fn in qs.items():
        # best of N runs: the first pays one-time codegen/JIT compile
        # of the query's generated classes; steady-state throughput is
        # the min. Sub-2s rows sit in the host's 1.1-1.4x run-to-run
        # noise band where a 2-sample min is itself noisy (VERDICT r8
        # #4: ~70 of 130 rows were unadjudicatable), so they take a
        # THIRD sample — min-of-3 keeps repeated solo runs within
        # ~1.1x on those rows. A >1.5x-disagreeing pair (observed 2-4x
        # inflation under concurrent load) also takes the extra
        # sample, so one noisy window can't inflate the total.
        best = -1.0
        try:
            samples: list[float] = []
            discards = 0
            while True:
                # reject samples attempted inside a host episode — for
                # EVERY sample of EVERY row (round-10 #4: the r9 guard
                # only armed on sub-2s rows, and the >2s family then
                # drifted a correlated ~1.2x through an episode the
                # calibration never sampled; the ~0.22s probe is noise
                # against a 2-7s row and decisive for it)
                probe = _calibrate()
                calibration["probe_max_sec"] = round(
                    max(calibration["probe_max_sec"], probe), 4
                )
                if discards < 5 and probe > 1.6 * cal_base:
                    discards += 1
                    calibration["n_discards"] += 1
                    calibration["discards"][name] = discards
                    time.sleep(2.0)
                    continue
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
                # operators persist intermediates; drop them so reruns
                # and later queries aren't timed under accumulated
                # cache + GC pressure
                spark.catalog.clearCache()
                best_now = min(samples)
                # <2s: min-of-3; <0.6s (where a single GC pause is a
                # 1.5x outlier): min-of-4 — the extra sample costs
                # ~0.3s and halves the spread of the min statistic
                need = 2 if best_now >= 2.0 else (3 if best_now >= 0.6 else 4)
                # a disagreeing pair takes a tie-breaker: >1.5x for
                # fast rows (GC-pause territory), and already >1.2x
                # for >=2s rows, where a real plan regression and an
                # episode tail are otherwise indistinguishable
                if len(samples) == 2:
                    ratio = max(samples) / max(1e-9, min(samples))
                    if ratio > (1.2 if best_now >= 2.0 else 1.5):
                        need = max(need, 3)
                if len(samples) >= need:
                    break
            best = min(samples)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            best = -1.0
        times[name] = best
        print(f"bench {name}: {best}", file=sys.stderr, flush=True)

    # self-timed probes (streaming micro-batch latency, store
    # retention/compaction): the callable measures and returns seconds
    # itself; best-of-2 like the query rows, outside the contract total
    for name, fn in getattr(entrymod, "bench_probes", dict)().items():
        best = -1.0
        try:
            samples = []
            for _ in range(2):
                samples.append(fn(spark, sf_dir))
                spark.catalog.clearCache()
            best = min(samples)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
        times[name] = best
        print(f"bench {name}: {best}", file=sys.stderr, flush=True)

    total = round(
        sum(t for n, t in times.items() if t >= 0 and n in contract), 3
    )
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "calibration": calibration,
            }
        )
    )


if __name__ == "__main__":
    main()
