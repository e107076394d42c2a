"""Round-11 optimization probe: time selected queries in isolation and
capture their formatted plans.

Usage::

    python tools/opt_probe.py [--sf DIR] [--samples N] [--plans OUTDIR] q1 q2 ...

Methodology matches bench.py (guide §1.1/§1.4): noop sink so the full
plan runs without a real sink, min-of-N so the first sample's codegen
cost doesn't read as steady state, clearCache between samples, job
descriptions labeled per query.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for <q>.txt explain dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pond_spark.session import get_spark

    spark = get_spark("pond_spark_opt_probe")
    qs = entrymod.queries()
    qs.update(entrymod.bench_queries())

    # JVM + Arrow worker warmup (same as bench.py)
    spark.range(1_000_000).selectExpr("sum(id % 97)").collect()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(32).repartition(32).mapInPandas(_noop, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    for name in args.names:
        if name not in qs:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        if args.plans:
            from pond_spark.plans.inspect import formatted_plan

            plan = formatted_plan(fn(spark, args.sf))
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        samples = []
        for i in range(args.samples):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        if samples:
            print(f"{name}: min={min(samples)} samples={samples}", flush=True)
        else:
            print(f"{name}: plan captured", flush=True)


if __name__ == "__main__":
    main()
