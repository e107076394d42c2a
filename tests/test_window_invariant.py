"""The driver-window invariant (VERDICT r4 ask #1), machine-checked:
every query whose implementing code changed since the last round
boundary must sit inside the driver's 50-query check window.

No Spark session needed — pure AST + git."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import check_window as cw  # noqa: E402


def test_query_module_map_is_precise():
    """The auto-derived map must pick up real implementing modules
    (including __init__ re-exports and transitive pond_spark imports)
    without smearing whole packages onto every query."""
    qm = cw.query_module_map()
    assert "pond_spark.dedup.minhash" in qm["minhash_pairs"]
    assert "pond_spark.operators.skew" in qm["minhash_pairs"]  # transitive
    assert "pond_spark.functions.bm25" in qm["bm25_search"]
    assert "pond_spark.operators.sketches" in qm["uniques_sketch_rollup"]
    assert "pond_spark.multimodal.codecs" in qm["media_decode_real"]
    # precision: a text query must not depend on the similarity family
    assert not any(m.startswith("pond_spark.similarity") for m in qm["bm25_search"])
    assert not any(m.startswith("pond_spark.dedup") for m in qm["scan_window"])


def test_every_registered_query_is_mapped():
    order = cw.registered_order()
    qm = cw.query_module_map()
    assert set(order) == set(qm)
    # TPC-H-style queries written wholly in the entry file legitimately
    # map to no pond_spark module; everything else must map to >= 1
    entry_only = {q for q, m in qm.items() if not m}
    assert entry_only <= {
        "pricing_summary", "promo_revenue", "top_revenue_join",
        "regional_revenue", "top_parts_per_supplier", "vocab_stats",
    }, f"unexpectedly unmapped: {entry_only}"


def test_synthetic_change_rotates_into_window():
    """A change to a module must flag its below-window queries."""
    qm = cw.query_module_map()
    order = cw.registered_order()
    # pick any module that backs a below-window query
    for mod in sorted({m for ms in qm.values() for m in ms}):
        below = [q for i, q in enumerate(order) if i >= cw.WINDOW and mod in qm[q]]
        if below:
            bad, exempted = cw.check({mod})
            flagged = {b[0] for b in bad} | {e[0] for e in exempted}
            assert flagged == set(below)
            # every exemption applied must be a declared (query, module)
            for q, _i, _why in exempted:
                assert (q, mod) in cw.EXEMPT
            return
    pytest.skip("no module backs a below-window query (fully rotated)")


def test_entry_fingerprint_ignores_cosmetics_catches_edits():
    src = open(cw.ENTRY).read()
    base = cw._entry_query_fingerprints(src)
    assert base, "no query fingerprints derived"
    # comment edits don't move any fingerprint
    assert cw._entry_query_fingerprints("# leading comment\n" + src) == base
    # a semantic edit inside one query function moves exactly the
    # queries whose closure contains it: retarget q_last's body
    marker = "def q_last(spark: SparkSession, sf_dir: str) -> DataFrame:"
    assert marker in src
    edited = src.replace(
        marker, marker + "\n    _fingerprint_probe = 12345", 1
    )
    changed = cw._entry_query_fingerprints(edited)
    moved = {q for q in base if changed[q] != base[q]}
    assert "last" in moved
    assert "scan_window" not in moved


def test_window_invariant_holds_now():
    """THE gate: at any commit (and in the working tree), queries on
    code changed since the last round boundary are inside the window."""
    try:
        ref = cw.last_round_ref()
    except (RuntimeError, subprocess.CalledProcessError):
        pytest.skip("no round boundary commit in history")
    changed = cw.changed_modules(ref)
    entry_changed = cw.entry_changed_queries(ref)
    bad, exempted = cw.check(changed, entry_changed)
    assert not bad, (
        "stale-green risk — rotate these into the first "
        f"{cw.WINDOW} of _QUERIES: {[(q, i, sorted(h)) for q, i, h in bad]}"
    )
    # exemptions are a capacity valve, not a convenience: they may
    # only exist when the changed-module query set exceeds the window
    if exempted:
        qm = cw.query_module_map()
        n_changed_queries = sum(
            1
            for i, q in enumerate(cw.registered_order())
            if (set(qm.get(q, set())) & set(changed)) or q in entry_changed
        )
        assert n_changed_queries > cw.WINDOW, (
            f"{len(exempted)} exemption(s) applied but the changed set "
            f"({n_changed_queries}) fits the window — rotate instead"
        )
