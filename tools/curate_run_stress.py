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
    # --dim=256 re-runs the emb legs at another dimensionality (the
    # round-10 dim-generalization validation: the coefficient-sized
    # gate must hold <=5% at dims besides the r9-calibrated 64).
    legs = {"resume", "minhash", "emb"}
    dim = 64
    for a in sys.argv[1:]:
        if a.startswith("--legs="):
            legs = {x for x in a.split("=", 1)[1].split(",") if x}
        elif a.startswith("--dim="):
            dim = int(a.split("=", 1)[1])

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

        if "emb" in legs or "embv" in legs:
            # (``embv`` runs ONLY the verified legs (b)+(c) — the
            # cheap configuration for 10M-scale verified-gate points
            # where the verify-less leg's 10M number already exists)
            # ---- embedding-gated leg: the SEMANTIC gate. Vectors are
            # a pure function of doc_id, so day-2 repeats carry
            # identical vectors (certain bucket collision, cosine 1.0);
            # new docs land in quasi-random buckets, and the drop rate
            # of NEW content (vs the digest-gate survivor reference) is
            # the gate's measured overshoot. Two r9 modes (VERDICT r8
            # #2 fix), both measured:
            #
            # (a) verify-less gate at GATE-SIZED nbits — advise()'s
            #     recommended_gate_nbits = log2(n*tables/0.05)+1, so
            #     occupancy (and with it the false-drop rate) stays
            #     under the 5% bound the r8 leg blew through (22-71%
            #     at candidate-mode nbits);
            # (b) VERIFIED gate at deliberately-saturated candidate
            #     nbits (24x1 — the r8 failure point): store_vectors +
            #     exact-cosine verify must hold overshoot ~0 no matter
            #     the occupancy.
            import math

            from pyspark.sql import functions as F

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

            # (a) gate-sized verify-less: the a-priori form of
            # advise()['recommended_gate_nbits'] (the catalog can only
            # recommend AFTER registering; sizing for the planned
            # daily volume uses the same formula). The coefficient is
            # the MEASURED per-dim curve (round-10 #1,
            # tools/gate_dim_calibration.py + rhp_gate_coefficient) —
            # the r9 constant 1.27 was a dim=64 fit; low dims need
            # more bits/decade, high dims fewer. emb_max_overshoot
            # keeps the refusing operational mode: wrong sizing
            # raises, never silently drops.
            from pond_spark.similarity.catalog import rhp_gate_coefficient

            coef = rhp_gate_coefficient(dim)
            gate_nbits = min(
                dim, 63, math.ceil(coef * math.log2(n * 1 / 0.05))
            )
            if "emb" not in legs:
                gate_nbits = None  # embv: skip the verify-less leg
            ecfg = None if gate_nbits is None else _replace(
                cfg,
                extra={"emb_dim": dim, "emb_nbits": gate_nbits,
                       "emb_tables": 1, "emb_max_overshoot": 0.05},
            )
            if ecfg is not None:
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
                from pond_spark.similarity.catalog import EmbeddingCatalog

                predicted_ppm = int(
                    EmbeddingCatalog(
                        spark, ecat, dim=dim, nbits=gate_nbits, n_tables=1
                    ).predicted_gate_overshoot() * 1_000_000
                )
                emb_leg = {
                    "n_docs_per_day": n,
                    "mode": "verify-less, gate-sized",
                    "dim": dim,
                    "coefficient": round(coef, 4),
                    "gate_nbits": gate_nbits,
                    "day1_emb_gated_s": e_day1_s,
                    "day2_emb_gated_s": e_day2_s,
                    "rows_day2_emb_gated": e_rows,
                    # fraction of NEW content (digest-gate survivors) the
                    # semantic gate ALSO dropped — the overshoot bound under
                    # test (<= 5% at the advised nbits)
                    "new_content_overshoot_ppm": int(
                        (1 - e_rows / max(1, rows_gated)) * 1_000_000
                    ),
                    "predicted_overshoot_ppm": predicted_ppm,
                    "catalog_bucket_rows": spark.read.parquet(ecat).count(),
                }
                print("DAILYSTRESS_EMB " + json.dumps(emb_leg))
                assert 0 < e_rows <= rows_gated
                # the round-9 acceptance bound: <=5% of genuinely-new
                # content falsely gated at the advised gate nbits
                assert e_rows >= rows_gated * 0.95, emb_leg

            # (b) verified gate at the r8 failure point (nbits=24 x 1):
            # occupancy may be arbitrarily high — the exact-cosine
            # verify leg must keep every new doc whose true cosine to
            # the stored corpus is below the threshold.
            vcfg = _replace(
                cfg,
                extra={"emb_dim": dim, "emb_nbits": 24, "emb_tables": 1,
                       "emb_verify_cos": 0.9},
            )
            vcat = os.path.join(root, "vbuckets")
            t0 = time.perf_counter()
            curate_run(
                spark, d1v, os.path.join(root, "wv1"), vcfg,
                embedding_catalog_path=vcat,
            )
            v_day1_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            v2 = curate_run(
                spark, d2v, os.path.join(root, "wv2"), vcfg,
                embedding_catalog_path=vcat,
            )
            v_day2_s = round(time.perf_counter() - t0, 1)
            v_rows = spark.read.parquet(final_corpus_path(v2)).count()
            ver_leg = {
                "n_docs_per_day": n,
                "mode": "verified (exact-cosine), candidate nbits=24",
                "day1_emb_verified_s": v_day1_s,
                "day2_emb_verified_s": v_day2_s,
                "rows_day2_emb_verified": v_rows,
                "new_content_overshoot_ppm": int(
                    (1 - v_rows / max(1, rows_gated)) * 1_000_000
                ),
                "catalog_bucket_rows": spark.read.parquet(vcat).count(),
                "catalog_vector_rows": spark.read.parquet(
                    vcat + ".vectors"
                ).count(),
            }
            print("DAILYSTRESS_EMB_VERIFIED " + json.dumps(ver_leg))
            # repeats (cosine 1.0, same id — the gate must drop
            # registered content regardless of id) drop; random new
            # vectors essentially never reach cosine 0.9 -> overshoot
            # ~0 even with the bucket space saturated. Both directions
            # asserted: no repeat leaks, no new content lost.
            assert rows_gated * 0.99 <= v_rows <= rows_gated * 1.01, ver_leg

            # (c) verified gate at the RECOMMENDED configuration
            # (round-10 #3): verify-mode nbits (candidate-volume
            # optimum, ~1 unrelated candidate per probe — coef·log2(n)
            # instead of the saturated 24) + the BUCKETED vector
            # sibling (vec_id-bucketed files: the verify join's
            # payload side plans with zero exchange; only candidate
            # ids cross the wire). Same correctness asserts as (b);
            # the day-2 delta vs (b) is the measured cost reduction
            # the r9 VERDICT asked for (r9 rows: 75.2 s at 1M / 276 s
            # at 10M, saturated + plain-parquet sibling).
            # NO emb_nbits / emb_vector_buckets: round-11 #3 made the
            # sized+bucketed configuration the curate_run DEFAULT for
            # the verified gate — this leg now runs FLAG-FREE and
            # asserts the derivation lands on the values the r10 leg
            # passed by hand (verify-mode nbits from the day-1 count;
            # buckets = 2^round(log2(n/300k)) at n >= 1M, else None)
            vnbits = min(dim, 63, math.ceil(coef * math.log2(max(2, n))))
            want_buckets = (
                max(4, min(512, 2 ** round(math.log2(n / 300_000))))
                if n >= 1_000_000 else None
            )
            scfg = _replace(
                cfg,
                extra={"emb_dim": dim, "emb_tables": 1,
                       "emb_verify_cos": 0.9},
            )
            scat = os.path.join(root, "sbuckets")
            t0 = time.perf_counter()
            curate_run(
                spark, d1v, os.path.join(root, "ws1"), scfg,
                embedding_catalog_path=scat,
            )
            s_day1_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            s2 = curate_run(
                spark, d2v, os.path.join(root, "ws2"), scfg,
                embedding_catalog_path=scat,
            )
            s_day2_s = round(time.perf_counter() - t0, 1)
            s_rows = spark.read.parquet(final_corpus_path(s2)).count()
            # the derivation must have pinned the expected sizing in
            # the catalog's params sidecar (and the manifest)
            with open(scat + ".params.json") as f:
                derived = json.load(f)
            assert derived["nbits"] == vnbits, derived
            assert derived["vector_buckets"] == want_buckets, derived
            # plan audit: the bucketed sibling must scan bucketed and
            # save (at least) the payload exchange vs a plain read
            from pond_spark.plans.inspect import (
                count_exchanges, formatted_plan,
            )
            from pond_spark.similarity.catalog import EmbeddingCatalog

            sized_cat = EmbeddingCatalog(
                spark, scat, dim=dim, nbits=vnbits, n_tables=1,
                store_vectors=True, vector_buckets=want_buckets,
            )
            probe = spark.read.parquet(d2v)
            prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = formatted_plan(
                    sized_cat.filter_new(probe, id_col="doc_id",
                                         verify_cos=0.9)
                )
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", prev_thr
                )
            sized_leg = {
                "n_docs_per_day": n,
                "mode": "verified, DERIVED sizing (flag-free default)",
                "dim": dim,
                "verify_nbits": vnbits,
                "vector_buckets": want_buckets,
                "day1_s": s_day1_s,
                "day2_s": s_day2_s,
                "rows_day2": s_rows,
                "new_content_overshoot_ppm": int(
                    (1 - s_rows / max(1, rows_gated)) * 1_000_000
                ),
                "day2_vs_saturated_ratio": round(
                    s_day2_s / max(0.1, v_day2_s), 3
                ),
                "vector_scan_bucketed": "Bucketed: true" in plan,
            }
            print("DAILYSTRESS_EMB_SIZED " + json.dumps(sized_leg))
            if want_buckets:
                assert sized_leg["vector_scan_bucketed"], \
                    "vector scan not bucketed"
            assert rows_gated * 0.99 <= s_rows <= rows_gated * 1.01, sized_leg

        if "retention" in legs:
            # ---- retention leg (VERDICT r8 missing #3): N simulated
            # days against ONE digest catalog with a rolling
            # max_age=3-day expire after each day's register. The
            # catalog must stay bounded (~3 days of digests) instead of
            # growing with history, and content whose stamp aged out
            # must re-admit through the gate.
            from pond_spark.dedup.exact import DigestCatalog

            DAY = 86_400
            n_days, keep_days = 6, 3
            per_day = max(1, n // n_days)
            rcat = os.path.join(root, "rdigests")
            cat = DigestCatalog(spark, rcat)
            all_docs = spark.read.parquet(src)
            day_rows, t0 = [], time.perf_counter()
            for d in range(n_days):
                sl = all_docs.filter(
                    (F.col("doc_id") >= d * per_day)
                    & (F.col("doc_id") < (d + 1) * per_day)
                )
                cat.register(cat.filter_new(sl), run_ts=(d + 1) * DAY)
                # horizon keeps exactly the last keep_days stamps
                # (stamps are (d+1)*DAY; expire keeps ts >= before_ts)
                cat.expire(before_ts=(d + 2 - keep_days) * DAY)
                day_rows.append(spark.read.parquet(rcat).count())
            ret_s = round(time.perf_counter() - t0, 1)
            day0 = all_docs.filter(F.col("doc_id") < per_day)
            readmitted = cat.filter_new(day0).count()
            ret_leg = {
                "n_docs_total": n,
                "n_days": n_days,
                "keep_days": keep_days,
                "catalog_rows_per_day": day_rows,
                "wall_s": ret_s,
                "day0_rows": day0.count(),
                "day0_readmitted": readmitted,
                "evictions": len(cat.retention_history()),
            }
            print("DAILYSTRESS_RETENTION " + json.dumps(ret_leg))
            # bounded: the steady-state catalog holds ~keep_days of
            # registrations, not the whole history
            assert max(day_rows[keep_days:]) <= max(
                1, int(1.1 * keep_days * max(day_rows[:1]))
            ), ret_leg
            # growth stops once the horizon engages
            assert day_rows[-1] <= int(1.15 * day_rows[keep_days - 1]), ret_leg
            # day-0 content aged out -> re-admitted (minus any text also
            # re-seen within the window; slices are disjoint id ranges,
            # but the synth hub text spans every slice)
            assert readmitted > 0, ret_leg
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
