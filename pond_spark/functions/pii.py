"""PII scrubbing for training-data pipelines: replace emails, phone
numbers and IPv4 literals embedded in free text with fixed placeholder
tokens (the standard pre-training redaction pass — cf. the C4/RefinedWeb
cleanup stages; the reference engine's per-field anonymization is
functions/anonymize.py, this operator is its free-text counterpart).

Patterns are deliberately kept to the regex subset that Java's engine
(Spark) and RE2 (DuckDB) interpret identically — no backreferences, no
lookaround — so the oracle twin applies the byte-identical pattern.
All replacements are pure ``regexp_replace`` chains: JVM-side,
whole-stage codegen, no UDFs, trivially scalable (map-only stage).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern, placeholder — applied in order (emails first so the
#: host part of an address can't be half-eaten by the IP rule)
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # (?:\+|\b) not \b\+?: there is no word boundary between a space
    # and '+', so the optional-plus branch of the old form could never
    # consume a leading '+' — '+1-555-...' scrubbed to '+<PHONE>'
    (r"(?:\+|\b)\d{1,3}[- .]\d{3}[- .]\d{3,4}[- .]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
)


def pii_scrub(col: Column) -> Column:
    """Text with every PII match replaced by its placeholder token."""
    out = col
    for pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out.alias("scrubbed")


def pii_count(col: Column) -> Column:
    """How many PII spans the scrub would replace (pre-replacement
    count over the same rule list, counted rule-by-rule on the
    progressively scrubbed text so overlapping rules don't double
    count — mirrors ``pii_scrub``'s sequential application).

    NOTE: as a single Column expression each count term embeds the
    prior replacements as an unshared subexpression (Spark's CSE does
    not merge them), so the chain costs ~R²/2 regex passes per row —
    fine for ad-hoc use; the hot path is :func:`pii_metrics`, which
    stages each step once (the quality_metrics discipline)."""
    total = F.lit(0)
    cur = col
    for pattern, token in PII_RULES:
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pattern), 0))
        cur = F.regexp_replace(cur, pattern, token)
    return total.alias("n_pii")


def pii_metrics(
    df,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
    scrub_col: str = "scrubbed",
    count_col: str = "n_pii",
):
    """DataFrame twin of ``pii_scrub`` + ``pii_count`` with each
    rule's intermediate staged exactly once (one select per rule, so
    whole-stage codegen evaluates R regex replaces + R counts instead
    of the ~R²/2 the inline Column chain pays — the
    normalize_urls/quality_metrics staging rule; r6 review finding)."""
    kept = [F.col(c) for c in keep_cols]
    out = df.select(*kept, F.col(text_col).alias("_cur"), F.lit(0).alias("_n"))
    for pattern, token in PII_RULES:
        out = out.select(
            *kept,
            F.regexp_replace(F.col("_cur"), pattern, token).alias("_cur"),
            (
                F.col("_n")
                + F.size(F.regexp_extract_all(F.col("_cur"), F.lit(pattern), 0))
            ).alias("_n"),
        )
    return out.select(
        *kept,
        F.col("_cur").alias(scrub_col),
        F.col("_n").alias(count_col),
    )


def pii_scrub_sql(expr: str) -> str:
    """DuckDB twin: identical patterns, identical order ('g' flag —
    DuckDB replaces only the first match by default, Spark replaces
    all)."""
    out = expr
    for pattern, token in PII_RULES:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return out


def pii_count_sql(expr: str) -> str:
    parts = []
    cur = expr
    for pattern, token in PII_RULES:
        p = pattern.replace("'", "''")
        parts.append(f"len(regexp_extract_all({cur}, '{p}'))")
        cur = f"regexp_replace({cur}, '{p}', '{token}', 'g')"
    return " + ".join(parts)
