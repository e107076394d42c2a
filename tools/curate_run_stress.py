#!/usr/bin/env python3
"""curate_run resume stress: the stage-materializing curation driver
(pipeline.curate_run, round 8) at 1M docs — proves the resume story at
a scale where stage wall-times are visible, not just on the pytest
fixture:

1. fresh run over the pipeline_stress synthetic corpus (hub of exact
   dups + unique mass): every stage computes; per-stage wall recorded;
2. simulated crash: the LAST stage's ``_SUCCESS`` marker is removed;
3. resume run: earlier stages must report ``resumed`` (metadata-only),
   only the broken stage recomputes, and the recomputed final corpus
   must be row-identical to the original (stage determinism is what
   makes resume correct).

Then the DAILY cross-run phase (late-r8, round-9 #3): day 1 registers
its shipped digests, day 2 arrives with ~50% exact repeats of day-1
content (id-shifted slice of the same deterministic synth corpus) —
the catalog_gate must drop the repeat mass, and the gate's overhead is
measured against an ungated day-2 run. The gate's scale story under
test: the anti-join ships 32-byte digests only, never documents.

Usage::

    python tools/curate_run_stress.py [n_docs]

Prints ``RUNSTRESS {...}`` and ``DAILYSTRESS {...}`` JSON lines.
~4-6 min at the default 1M.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    # --legs=resume,minhash,emb selects the optional legs; the digest
    # daily leg always runs (it builds day2 and the reference counts
    # the other legs assert against). `--legs=` alone = digest only —
    # the cheap configuration for large-n scale points.
    legs = {"resume", "minhash", "emb"}
    for a in sys.argv[1:]:
        if a.startswith("--legs="):
            legs = {x for x in a.split("=", 1)[1].split(",") if x}

    from pond_spark.pipeline import CurationConfig, curate_run
    from pond_spark.session import get_spark
    from tools.pipeline_stress import _synth_pipeline_docs

    spark = get_spark("curate_run_stress")
    root = tempfile.mkdtemp(prefix="pond_runstress_")
    try:
        src = os.path.join(root, "docs")
        t0 = time.perf_counter()
        _synth_pipeline_docs(spark, n).coalesce(8).write.parquet(src)
        gen_s = round(time.perf_counter() - t0, 1)

        cfg = CurationConfig(
            min_words=5, sample_rate=0.5, stages=("quality", "exact_dedup", "sample")
        )
        work = os.path.join(root, "work")

        if "resume" in legs:
            t0 = time.perf_counter()
            r1 = curate_run(spark, src, work, cfg)
            fresh_s = round(time.perf_counter() - t0, 1)
            final1 = spark.read.parquet(r1[-1]["path"]).count()

            # crash: the last stage lost its marker mid-write
            os.remove(os.path.join(r1[-1]["path"], "_SUCCESS"))
            t0 = time.perf_counter()
            r2 = curate_run(spark, src, work, cfg)
            resume_s = round(time.perf_counter() - t0, 1)
            final2 = spark.read.parquet(r2[-1]["path"]).count()

            report = {
                "n_docs": n,
                "gen_s": gen_s,
                "fresh_s": fresh_s,
                "resume_s": resume_s,
                "statuses_fresh": [r["status"] for r in r1],
                "statuses_resume": [r["status"] for r in r2],
                "final_rows": final1,
            }
            print("RUNSTRESS " + json.dumps(report))
            assert [r["status"] for r in r2] == ["resumed", "resumed", "computed"]
            assert final1 == final2  # determinism: recompute == original
            assert resume_s < fresh_s  # only the broken stage re-ran

        # ---- daily cross-run phase: day 2 is an id-shifted slice so
        # ~half its texts repeat day 1 (the synth text is a pure
        # function of id); the digest gate must drop that mass
        day2_src = os.path.join(root, "docs_day2")
        (
            _synth_pipeline_docs(spark, n + n // 2)
            .filter(f"doc_id >= {n // 2}")
            .coalesce(8)
            .write.parquet(day2_src)
        )
        cat = os.path.join(root, "digests")
        t0 = time.perf_counter()
        curate_run(
            spark, src, os.path.join(root, "wd1"), cfg,
            digest_catalog_path=cat,
        )
        day1_s = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        g2 = curate_run(
            spark, day2_src, os.path.join(root, "wd2"), cfg,
            digest_catalog_path=cat,
        )
        day2_gated_s = round(time.perf_counter() - t0, 1)
        from pond_spark.pipeline import final_corpus_path

        rows_gated = spark.read.parquet(final_corpus_path(g2)).count()
        t0 = time.perf_counter()
        u2 = curate_run(
            spark, day2_src, os.path.join(root, "wu2"), cfg
        )
        day2_ungated_s = round(time.perf_counter() - t0, 1)
        rows_ungated = spark.read.parquet(u2[-1]["path"]).count()
        daily = {
            "n_docs_per_day": n,
            "day1_gated_s": day1_s,
            "day2_gated_s": day2_gated_s,
            "day2_ungated_s": day2_ungated_s,
            "rows_day2_gated": rows_gated,
            "rows_day2_ungated": rows_ungated,
            "catalog_digests": spark.read.parquet(cat).count(),
        }
        print("DAILYSTRESS " + json.dumps(daily))
        # the repeat mass (~half of day 2) must be gone, and the gate
        # must not multiply day-2 cost (digest-only anti-join)
        assert rows_gated < rows_ungated * 0.7

        if "minhash" in legs:
            # ---- minhash-gated leg: the NEAR gate at the same scale.
            # Day-2 exact repeats share every band key -> all dropped;
            # the near-pair construction (last word differs) makes each
            # new near-doc collide with its registered partner too, so
            # survivors ~= the genuinely-unique new half minus near mass.
            mcat = os.path.join(root, "bands")
            t0 = time.perf_counter()
            curate_run(
                spark, src, os.path.join(root, "wm1"), cfg,
                minhash_catalog_path=mcat,
            )
            m_day1_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            m2 = curate_run(
                spark, day2_src, os.path.join(root, "wm2"), cfg,
                minhash_catalog_path=mcat,
            )
            m_day2_s = round(time.perf_counter() - t0, 1)
            m_rows = spark.read.parquet(final_corpus_path(m2)).count()
            minhash_leg = {
                "n_docs_per_day": n,
                "day1_minhash_gated_s": m_day1_s,
                "day2_minhash_gated_s": m_day2_s,
                "rows_day2_minhash_gated": m_rows,
                "catalog_band_rows": spark.read.parquet(mcat).count(),
            }
            print("DAILYSTRESS_MINHASH " + json.dumps(minhash_leg))
            assert m_rows <= rows_gated  # near gate is strictly stronger

        if "emb" in legs:
            # ---- embedding-gated leg: the SEMANTIC gate at 1M/day.
            # Vectors are a pure function of doc_id, so day-2 repeats
            # carry identical vectors (certain bucket collision); new
            # docs land in quasi-random buckets, and the drop rate of NEW
            # content is the gate's documented overshoot at this
            # nbits/tables point — the advise() tuning surface, measured.
            from pyspark.sql import functions as F

            dim = 64

            def with_vecs(src_path, out_path):
                (
                    spark.read.parquet(src_path)
                    .withColumn(
                        "embedding",
                        F.transform(
                            F.sequence(F.lit(0), F.lit(dim - 1)),
                            lambda j: (
                                F.pmod(F.xxhash64(F.col("doc_id"), j),
                                       F.lit(2001))
                                / F.lit(1000.0)
                                - F.lit(1.0)
                            ).cast("float"),
                        ),
                    )
                    .write.parquet(out_path)
                )

            d1v, d2v = os.path.join(root, "d1v"), os.path.join(root, "d2v")
            with_vecs(src, d1v)
            with_vecs(day2_src, d2v)
            from dataclasses import replace as _replace

            # nbits=24 x 1 table x dim=64. Two measured degeneracies on
            # the way here (PERF_NOTES): 2^20 buckets x 2 tables at 1M
            # random vectors -> 99.5% new-content overshoot (every bucket
            # occupied); and dim=16 at nbits=24 -> 75% (24 sign bits in a
            # 16-dim space carry at most ~16 bits of bucket entropy, so
            # the effective table is tiny no matter the nbits). The gate's
            # selectivity needs BOTH enough buckets and enough vector
            # dimensions to fill them — real embedding dims (>=64) are.
            ecfg = _replace(
                cfg, extra={"emb_dim": dim, "emb_nbits": 24, "emb_tables": 1}
            )
            ecat = os.path.join(root, "buckets")
            t0 = time.perf_counter()
            curate_run(
                spark, d1v, os.path.join(root, "we1"), ecfg,
                embedding_catalog_path=ecat,
            )
            e_day1_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            e2 = curate_run(
                spark, d2v, os.path.join(root, "we2"), ecfg,
                embedding_catalog_path=ecat,
            )
            e_day2_s = round(time.perf_counter() - t0, 1)
            e_rows = spark.read.parquet(final_corpus_path(e2)).count()
            emb_leg = {
                "n_docs_per_day": n,
                "day1_emb_gated_s": e_day1_s,
                "day2_emb_gated_s": e_day2_s,
                "rows_day2_emb_gated": e_rows,
                # vs the exact-gate survivor count: the fraction of NEW
                # content the semantic gate ALSO dropped (bucket-collision
                # overshoot at nbits=20 x 2 tables on random vectors)
                "new_content_overshoot_ppm": int(
                    (1 - e_rows / max(1, rows_gated)) * 1_000_000
                ),
                "catalog_bucket_rows": spark.read.parquet(ecat).count(),
            }
            print("DAILYSTRESS_EMB " + json.dumps(emb_leg))
            # identical vectors superset identical texts -> at most the
            # digest-leg survivors; and the gate must not drop everything
            assert 0 < e_rows <= rows_gated
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
