#!/usr/bin/env python3
"""Solo A/B bench probe (VERDICT r6 ask #3): time named queries from a
given repo checkout, fresh session, N samples, clearing cache between
runs. Prints one JSON line ``ABPROBE {"query": [s, ...], ...}``.

Usage::

    python tools/ab_probe.py <repo_root> <q1,q2,...> [n_samples]

Run the two checkouts back-to-back (ideally interleaved A,B,A,B at the
process level) on an otherwise idle host — PERF_NOTES records 1.5-4x
sample swings under concurrent load.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root = sys.argv[1]
    names = sys.argv[2].split(",")
    n_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sys.path.insert(0, root)
    os.chdir(root)

    import __spark_entry__ as entrymod
    from pond_spark.session import get_spark

    spark = get_spark("ab_probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    qs.update(getattr(entrymod, "bench_queries", dict)())

    # same warmups as bench.py: JVM/parquet footers + the Arrow pool
    try:
        qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass
    try:

        def _noop(it):
            for pdf in it:
                yield pdf

        spark.range(32).repartition(32).mapInPandas(
            _noop, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    probes = getattr(entrymod, "bench_probes", dict)()
    out: dict[str, list[float]] = {}
    for n in names:
        samples = []
        for _ in range(n_samples):
            if n in probes:  # self-timed probe: returns seconds itself
                samples.append(round(float(probes[n](spark, sf_dir)), 3))
            else:
                t0 = time.perf_counter()
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[n] = samples
    print("ABPROBE " + json.dumps(out))


if __name__ == "__main__":
    main()
