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
    count — mirrors ``pii_scrub``'s sequential application)."""
    total = F.lit(0)
    cur = col
    for pattern, token in PII_RULES:
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pattern), 0))
        cur = F.regexp_replace(cur, pattern, token)
    return total.alias("n_pii")


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
