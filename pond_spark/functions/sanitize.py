"""Site-name sanitization for the per-site file sink (P6).

Reference: /root/reference/src/client/ResultWriter.cxx:77-110 — keep
``[A-Za-z0-9]``, replace every other char with ``_``; reject the name
entirely (skip the record) if it contains no safe character at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_site(col: Column) -> Column:
    """Filesystem-safe site name, NULL when unsanitizable (no safe
    chars) — callers filter on isNotNull() to reproduce the skip."""
    cleaned = F.regexp_replace(col, "[^A-Za-z0-9]", "_")
    has_safe = col.rlike("[A-Za-z0-9]")
    return F.when(col.isNull() | ~has_safe, F.lit(None).cast("string")).otherwise(
        cleaned
    )


def sanitize_site_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} IS NULL OR NOT regexp_matches({expr}, '[A-Za-z0-9]') "
        f"THEN NULL ELSE regexp_replace({expr}, '[^A-Za-z0-9]', '_', 'g') END"
    )
