#!/usr/bin/env python3
"""Catalog data-dependent-regime stress (VERDICT r6 ask #5).

PERF_NOTES' round-6 probes measured the two cross-run catalogs
(``dedup.MinHashCatalog``, ``similarity.EmbeddingCatalog``) at 5k
docs, where fixed costs (session, planning, sidecar IO) dominate and
"the data-dependent part is not yet visible". This tool exercises the
regime the catalogs were designed for:

- REGISTER 10M synthetic rows (2000x the sf0.01 corpus),
- PROBE a fresh 1M-row batch through ``filter_new`` and
  ``near_candidates``,
- measure per-step wall time AND probe-side shuffle read/write bytes
  (Spark REST status API, diffed across completed stages per step),
- verify the hot-bucket cap ENGAGES: the synthetic corpus embeds a
  100k-doc boilerplate hub (identical text / identical vector); the
  capped probe must drop every hub collision while keeping the
  planted unique-dup collisions, and an UNCAPPED 10-doc hub probe
  shows the quadratic blowup the cap exists to stop.

Synthetic layout (ids are dense longs; ``grp`` drives content —
equal grp => identical doc/vector):

- registered ids ``[0, 10M)``: ids < 100k share ``grp=0`` (the hub),
  the rest are unique (``grp=id``);
- probe ids ``[10M, 11M)``: the first 1k collide with the hub
  (``grp=0``), the next 10k duplicate registered unique docs
  (``grp = id - 10M + 100k``), the rest are fresh (``grp=id``).

Usage::

    python tools/catalog_stress.py [minhash|embedding|both] [n_reg] [n_probe]

Prints one JSON line per catalog: ``CATSTRESS {"catalog": ...}``.
Run on an idle host; ~10-20 min for both at the default 10M/1M.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HUB = 100_000
N_HUB_PROBE = 1_000
N_DUP_PROBE = 10_000
UI_PORT = 4057


def _get_spark():
    from pond_spark.session import get_spark

    return get_spark(
        "catalog_stress",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )


def _shuffle_totals(app_id: str) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over completed stages."""
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    stages = json.loads(urllib.request.urlopen(url, timeout=30).read())
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


class _Meter:
    """Wall time + shuffle-byte delta per named step."""

    def __init__(self, spark):
        self.app_id = spark.sparkContext.applicationId
        self.steps: dict[str, dict] = {}

    def run(self, name: str, fn):
        r0, w0 = _shuffle_totals(self.app_id)
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        r1, w1 = _shuffle_totals(self.app_id)
        self.steps[name] = {
            "wall_s": round(wall, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "result": out,
        }
        print(f"  {name}: {self.steps[name]}", flush=True)
        return out


def _grp_col(F, start: int, n: int, probe: bool):
    """Content group for ids [start, start+n) per the module layout."""
    if not probe:
        return F.when(F.col("id") < HUB, F.lit(0)).otherwise(F.col("id"))
    return (
        F.when(F.col("id") < start + N_HUB_PROBE, F.lit(0))
        .when(
            # planted dups of registered UNIQUE docs: offset past the
            # hub id range (registered ids < HUB all carry grp=0)
            F.col("id") < start + N_HUB_PROBE + N_DUP_PROBE,
            F.col("id") - start + HUB,
        )
        .otherwise(F.col("id"))
    )


def _synth_docs(spark, n: int, start: int = 0, probe: bool = False):
    """(doc_id, text): 12 words from a 1M vocab, equal grp => equal text."""
    from pyspark.sql import functions as F

    return (
        spark.range(start, start + n)
        .withColumn("grp", _grp_col(F, start, n, probe))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(11)),
                    lambda j: F.format_string(
                        "w%d", F.pmod(F.xxhash64(F.col("grp"), j), F.lit(1_000_000))
                    ),
                ),
            ).alias("text"),
        )
    )


def _synth_vecs(spark, n: int, dim: int, start: int = 0, probe: bool = False):
    """(vec_id, embedding float[dim]), equal grp => equal vector."""
    from pyspark.sql import functions as F

    return (
        spark.range(start, start + n)
        .withColumn("grp", _grp_col(F, start, n, probe))
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (
                    (F.pmod(F.xxhash64(F.col("grp"), j), F.lit(2001)) - 1000)
                    / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )
    )


def stress_minhash(
    spark, n_reg: int, n_probe: int, scheme: str | None = None
) -> dict:
    from pond_spark.dedup.minhash import MinHashCatalog

    print(f"minhash: register {n_reg}, probe {n_probe}", flush=True)
    path = tempfile.mkdtemp(prefix="stress_mh_") + "/cat"
    if scheme:  # e.g. file:// — run the whole discipline through _HadoopFS
        path = scheme + path
    cat = MinHashCatalog(spark, path, k=64, bands=16, n=1, seed=7)
    m = _Meter(spark)
    try:
        m.run("register_10m", lambda: cat.register(_synth_docs(spark, n_reg)))
        probe = _synth_docs(spark, n_probe, start=n_reg, probe=True)
        m.run("filter_new_1m", lambda: cat.filter_new(probe).count())
        m.run(
            "near_candidates_capped",
            lambda: cat.near_candidates(probe, max_bucket_size=1024).count(),
        )
        # cap engagement: the hub's 16 band keys are the ONLY keys
        # with more than 1024 stored docs...
        from pyspark.sql import functions as F

        hot = m.run(
            "hot_keys",
            lambda: cat._read()
            .groupBy("band_key")
            .count()
            .filter(F.col("count") > 1024)
            .count(),
        )
        # ...so a capped probe of pure hub docs yields ZERO candidates,
        # while uncapping 10 hub docs yields ~10 x HUB pairs.
        hub_probe = _synth_docs(spark, N_HUB_PROBE, start=n_reg, probe=True)
        capped_hub = m.run(
            "hub_capped",
            lambda: cat.near_candidates(
                hub_probe, max_bucket_size=1024
            ).count(),
        )
        hub10 = hub_probe.limit(10)
        uncapped_hub = m.run(
            "hub10_uncapped", lambda: cat.near_candidates(hub10).count()
        )
        # the hub contributes exactly 16 hot band keys; at 10M docs a
        # random band key can legitimately accumulate past the cap too
        assert hot >= 16, f"expected >= the hub's 16 hot band keys: {hot}"
        assert capped_hub == 0, f"cap failed to drop hub pairs: {capped_hub}"
        assert uncapped_hub >= 10 * (HUB - 1), uncapped_hub
        return {"catalog": "minhash", "n_reg": n_reg, "n_probe": n_probe,
                "steps": m.steps, "cap_engaged": True}
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def stress_embedding(
    spark, n_reg: int, n_probe: int, scheme: str | None = None
) -> dict:
    from pond_spark.similarity.catalog import EmbeddingCatalog

    print(f"embedding: register {n_reg}, probe {n_probe}", flush=True)
    path = tempfile.mkdtemp(prefix="stress_emb_") + "/cat"
    if scheme:
        path = scheme + path
    # nbits=20 (1M buckets/table): at 10M vectors the r6 default of 8
    # bits (256 buckets) degenerates to every-bucket-hot; the knob is
    # the documented scale dial, exercised here for real.
    cat = EmbeddingCatalog(spark, path, dim=32, nbits=20, n_tables=2, seed=7)
    m = _Meter(spark)
    try:
        m.run(
            "register_10m",
            lambda: cat.register(_synth_vecs(spark, n_reg, 32)),
        )
        probe = _synth_vecs(spark, n_probe, 32, start=n_reg, probe=True)
        m.run("filter_new_1m", lambda: cat.filter_new(probe).count())
        m.run(
            "near_candidates_capped",
            lambda: cat.near_candidates(probe, max_bucket_size=256).count(),
        )
        from pyspark.sql import functions as F

        hot = m.run(
            "hot_keys",
            lambda: cat._read()
            .groupBy("table", "bucket")
            .count()
            .filter(F.col("count") > 256)
            .count(),
        )
        hub_probe = _synth_vecs(
            spark, N_HUB_PROBE, 32, start=n_reg, probe=True
        )
        capped_hub = m.run(
            "hub_capped",
            lambda: cat.near_candidates(
                hub_probe, max_bucket_size=256
            ).count(),
        )
        hub10 = hub_probe.limit(10)
        uncapped_hub = m.run(
            "hub10_uncapped", lambda: cat.near_candidates(hub10).count()
        )
        # the hub contributes one >=100k bucket per table; random-vector
        # buckets may also exceed the cap, so >= 2, and the capped hub
        # probe must drop ALL hub pairs (hub buckets are far above cap)
        assert hot >= 2, f"expected >=2 hot buckets (hub x2 tables): {hot}"
        assert capped_hub == 0, f"cap failed to drop hub pairs: {capped_hub}"
        assert uncapped_hub >= 10 * (HUB - 1), uncapped_hub
        return {"catalog": "embedding", "n_reg": n_reg, "n_probe": n_probe,
                "steps": m.steps, "cap_engaged": True}
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "both"
    n_reg = int(args[1]) if len(args) > 1 else 10_000_000
    n_probe = int(args[2]) if len(args) > 2 else 1_000_000
    # --scheme=file:// routes every catalog path through the Hadoop
    # FileSystem layer (sidecars, compaction double-rename, advise
    # snapshots) — the in-test stand-in for hdfs:// (round-9 #4)
    scheme = None
    for a in sys.argv[1:]:
        if a.startswith("--scheme="):
            scheme = a.split("=", 1)[1]
    spark = _get_spark()
    runs = []
    if which in ("minhash", "both"):
        runs.append(stress_minhash(spark, n_reg, n_probe, scheme))
    if which in ("embedding", "both"):
        runs.append(stress_embedding(spark, n_reg, n_probe, scheme))
    for r in runs:
        print("CATSTRESS " + json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
