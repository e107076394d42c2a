"""Corpus-level line dedup (dedup/lines.py) and within-doc repetition
metrics (functions/repetition.py) on planted fixtures."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "nav bar" appears in 4 docs → boilerplate; docs 1-3 also
        # carry a unique line
        (1, "nav bar\nalpha beta gamma\nfooter text"),
        (2, "nav bar\ndelta epsilon"),
        (3, "nav bar\nfooter text\nzeta eta"),
        # doc made ENTIRELY of boilerplate → empty after strip
        (4, "nav bar\nfooter text"),
        # single unique line, survives untouched
        (5, "unique only line"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_strip_duplicate_lines_newline(docs):
    from pond_spark.dedup.lines import strip_duplicate_lines

    out = {
        r["doc_id"]: r
        for r in strip_duplicate_lines(docs, "text", "doc_id").collect()
    }
    assert len(out) == 5  # every input doc survives as a row
    assert out[1]["text_clean"] == "alpha beta gamma"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    assert out[2]["text_clean"] == "delta epsilon"
    assert out[3]["text_clean"] == "zeta eta"
    # "footer text" occurs in docs 1,3,4 → stripped everywhere
    assert out[4]["text_clean"] == "" and out[4]["n_removed"] == 2
    assert out[5]["text_clean"] == "unique only line"
    assert out[5]["n_removed"] == 0


def test_strip_preserves_order(spark):
    from pond_spark.dedup.lines import strip_duplicate_lines

    rows = [
        (1, "z last\nshared dup\na first"),
        (2, "shared dup"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_duplicate_lines(df).collect()}
    # original document order, NOT lexicographic
    assert out[1]["text_clean"] == "z last\na first"


def test_min_docs_threshold(docs):
    from pond_spark.dedup.lines import strip_duplicate_lines

    out = {
        r["doc_id"]: r
        for r in strip_duplicate_lines(docs, min_docs=5).collect()
    }
    # nothing reaches 5 docs → all lines kept
    assert all(r["n_removed"] == 0 for r in out.values())


def test_within_doc_repeat_not_boilerplate(spark):
    from pond_spark.dedup.lines import strip_duplicate_lines

    # a line repeated inside ONE doc is not corpus boilerplate
    df = spark.createDataFrame(
        [(1, "same line\nsame line"), (2, "other text")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in strip_duplicate_lines(df).collect()}
    assert out[1]["text_clean"] == "same line\nsame line"
    assert out[1]["n_removed"] == 0


def test_chunk_paragraphs(spark):
    from pond_spark.dedup.lines import chunk_paragraphs

    df = spark.createDataFrame([(1, "a b c d e f g h i")], ["doc_id", "text"])
    rows = sorted(
        chunk_paragraphs(df, words_per_chunk=4).collect(), key=lambda r: r["pos"]
    )
    assert [r["line"] for r in rows] == ["a b c d", "e f g h", "i"]


def test_repetition_metrics(spark):
    from pond_spark.functions.repetition import repetition_metrics

    rows = [
        (1, "spam spam spam spam"),  # one word repeated
        (2, "all words here differ"),  # no repetition
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_frac"] == 0.75  # 1 distinct / 4
    # most frequent bigram "spam spam" (len 9) occurs 3x but overlaps
    # cover the whole 19-char doc → capped at 1.0
    assert out[1]["top_2gram_char_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["dup_3gram_frac"] == 0.0
    # doc 2: each bigram unique → coverage = len(bigram)/len(text)
    assert 0.0 < out[2]["top_2gram_char_frac"] < 1.0


def test_repetition_empty_doc(spark):
    from pond_spark.functions.repetition import repetition_metrics

    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    r = repetition_metrics(df).collect()[0]
    # split('') yields [''] → one empty "word"; all fractions 0
    assert r["dup_word_frac"] == 0.0
    assert r["top_2gram_char_frac"] == 0.0


def test_strip_duplicate_lines_keeps_null_text_docs(spark):
    """Regression (r4 review): a NULL-text document produced zero line
    rows and vanished, violating the every-input-document contract."""
    from pond_spark.dedup.lines import strip_duplicate_lines

    df = spark.createDataFrame(
        [(1, "dup line\nunique one"), (2, "dup line\nother"), (5, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_duplicate_lines(df).collect()}
    assert set(out) == {1, 2, 5}
    assert out[5].text_clean == "" and out[5].n_lines == 0
    assert out[5].n_removed == 0
