"""End-to-end curation pipeline (pond_spark/pipeline.py) on a planted
corpus exercising every stage."""

from __future__ import annotations

import pytest

from pond_spark.pipeline import CurationConfig, curate


@pytest.fixture(scope="module")
def corpus(spark):
    good = "clean prose with plenty of ordinary readable words " * 3
    rows = [
        (1, good + "unique one"),
        (2, good + "unique one"),  # exact dup of 1 (after quality both pass)
        (3, good + "unique three"),
        (4, "too short"),  # fails quality (min_words)
        (5, good + "contact me at alice@example.com thanks"),  # PII
        (6, good + "leaked eval content that matches the benchmark set"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_full_chain(spark, corpus):
    eval_set = spark.createDataFrame(
        [(100, "leaked eval content that matches the benchmark set")],
        ["doc_id", "text"],
    )
    out = curate(
        corpus,
        CurationConfig(
            min_words=10,
            line_words_per_chunk=None,
            decontaminate_n=6,
            sample_rate=1.0,
            stages=(
                "quality",
                "exact_dedup",
                "pii",
                "decontaminate",
                "sample",
            ),
        ),
        eval_set=eval_set,
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert 4 not in got  # quality gate
    assert 2 not in got and 1 in got  # exact dedup keeps min id
    assert 6 not in got  # decontaminated
    assert 5 in got and "alice@example.com" not in got[5]  # PII scrubbed
    assert "[EMAIL]" in got[5] or "@" not in got[5]
    assert 3 in got


def test_curate_single_plan(spark, corpus):
    """The filter-only chain stays ONE Catalyst plan with the quality
    predicate evaluated before any shuffle (no intermediate actions)."""
    out = curate(
        corpus,
        CurationConfig(min_words=10, stages=("quality", "exact_dedup")),
    )
    # lazy: building the plan runs no jobs; the whole chain analyzes
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan  # dedup semi-join present in the single plan


def test_curate_unknown_stage_rejected(spark, corpus):
    with pytest.raises(ValueError):
        curate(corpus, CurationConfig(stages=("nonsense",)))


def test_curate_sample_deterministic(spark, corpus):
    a = curate(
        corpus,
        CurationConfig(min_words=10, sample_rate=0.5, stages=("quality", "sample")),
    )
    b = curate(
        corpus,
        CurationConfig(min_words=10, sample_rate=0.5, stages=("quality", "sample")),
    )
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )
