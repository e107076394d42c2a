"""Smoke-run every examples/ script at sf0.001 — the examples are the
user-facing composition recipes (README), so they must never rot.
Each main() is imported and invoked in-process (get_spark's
getOrCreate reuses the test session; none of them stop it)."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
SF = "/root/testdata/sf0.001"


def _run(name: str, argv: list[str], capsys) -> str:
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [name] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


@pytest.mark.usefixtures("spark")
def test_example_curate_corpus(tmp_path, capsys):
    out = _run("curate_corpus", [SF, str(tmp_path / "o")], capsys)
    assert "stage=near_dedup" in out and "curated" in out and "shards" in out


@pytest.mark.usefixtures("spark")
def test_example_build_ann_index(tmp_path, capsys):
    out = _run("build_ann_index", [SF, str(tmp_path / "ix")], capsys)
    assert out.strip()


@pytest.mark.usefixtures("spark")
def test_example_search_serving(tmp_path, capsys):
    out = _run("search_serving", [SF, str(tmp_path / "sv")], capsys)
    assert out.strip()


@pytest.mark.usefixtures("spark")
def test_example_tokenize_and_pack(tmp_path, capsys):
    out = _run("tokenize_and_pack", [SF, str(tmp_path / "pk")], capsys)
    assert out.strip()


@pytest.mark.usefixtures("spark")
def test_example_stream_curation(tmp_path, capsys):
    out = _run("stream_curation", [SF, str(tmp_path / "sc")], capsys)
    assert "batch=2 curated_rows=0" in out  # catalog gated re-delivery
    assert "catalog-gated" in out


@pytest.mark.usefixtures("spark")
def test_example_curate_resumable(tmp_path, capsys):
    out = _run("curate_resumable", [SF, str(tmp_path / "cr")], capsys)
    assert out.count("computed") >= 6  # fresh run (4) + post-crash (2)
    assert out.count("resumed") >= 6  # full resume (4) + post-crash (2)
    assert "curated rows:" in out


def test_example_curate_daily(tmp_path, capsys):
    out = _run("curate_daily", [SF, str(tmp_path / "cd")], capsys)
    assert out.count("stage_00_catalog_gate") == 3
    assert out.count("_REGISTERED") == 3
    # the retry resumes everything, including the registration
    assert out.count("resumed") >= 5
    assert "catalog digests:" in out
    # round-9 surface: the cross-run funnel and the retention cycle
    assert "funnel (pipeline.report_runs)" in out
    assert "registered=True" in out
    assert "expire kept 0 of" in out
    assert "re-admitted after eviction" in out
