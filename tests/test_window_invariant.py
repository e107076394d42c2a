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
    """A whole-module taint must flag every below-window query of
    that module (set input = module granularity, the sound fallback)."""
    qm = cw.query_module_map()
    order = cw.registered_order()
    # pick any module that backs a below-window query
    for mod in sorted({m for ms in qm.values() for m in ms}):
        below = [q for i, q in enumerate(order) if i >= cw.WINDOW and mod in qm[q]]
        if below:
            bad, exempted = cw.check({mod})
            assert not exempted  # whole-module taint: nothing exempts
            assert {b[0] for b in bad} == set(below)
            return
    pytest.skip("no module backs a below-window query (fully rotated)")


def test_symbol_level_exemption_is_computed_not_handwritten():
    """r6 ask #2: a below-window query on a changed MODULE is
    automatically exempt when none of its reachable SYMBOLS changed —
    and still flags when a reachable symbol did change."""
    order = cw.registered_order()
    reach = cw.query_symbol_reach()
    qm = cw.query_module_map()
    # find a (module, symbol) reached by some below-window query and a
    # sibling below-window query on the same module NOT reaching it
    for mod in sorted({m for ms in qm.values() for m in ms}):
        below = [q for i, q in enumerate(order) if i >= cw.WINDOW and mod in qm[q]]
        if len(below) < 2:
            continue
        for sym_q in below:
            syms = {s for m, s in reach[sym_q] if m == mod and s}
            others = [
                q for q in below
                if q != sym_q and not (syms & {s for m, s in reach[q] if m == mod})
            ]
            if syms and others:
                bad, exempted = cw.check({mod: set(syms)})
                assert sym_q in {b[0] for b in bad}
                assert set(others) <= {e[0] for e in exempted}
                return
    pytest.skip("no module with symbol-disjoint below-window queries")


def test_docstring_edit_does_not_taint():
    """A docstring-only change must produce an empty symbol diff."""
    import ast as _ast

    src = (
        'CONST = 7\n'
        'def f(x):\n    """old doc."""\n    return CONST + x\n'
    )
    new = src.replace("old doc.", "new doc, reworded.")
    a = cw.ModuleInfo("pond_spark.fake", src)
    b = cw.ModuleInfo("pond_spark.fake", new)
    assert a.fingerprint("f") == b.fingerprint("f")
    # a semantic edit DOES move it
    c = cw.ModuleInfo("pond_spark.fake", src.replace("CONST + x", "CONST - x"))
    assert a.fingerprint("f") != c.fingerprint("f")
    del _ast


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
    mods = cw.changed_modules(ref)
    entry_changed = cw.entry_changed_queries(ref)
    changed = cw.changed_symbols(ref, mods)
    bad, _exempted = cw.check(changed, entry_changed)
    assert not bad, (
        "stale-green risk — rotate these into the first "
        f"{cw.WINDOW} of _QUERIES: {[(q, i, sorted(h)) for q, i, h in bad]}"
    )
    # exemptions are now COMPUTED from the symbol diff (r6 ask #2) —
    # they need no capacity justification, and the hand-written EXEMPT
    # table must stay gone
    assert not hasattr(cw, "EXEMPT")
