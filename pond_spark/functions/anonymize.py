"""--anonymize (P2): zero the tail of client IPs before display.

Reference: doc/index.rst:213-217 (flag at
/root/reference/src/client/Main.cxx:258-259; the masking itself lives in
libcommon's OneLine formatter): IPv4 → last octet zeroed (``a.b.c.0``),
IPv6 → tail truncated (we keep the first 2 hextets and zero the rest —
a /32-style mask, matching the documented "remove the tail" behavior).
Display-only — never applied to filters.

Pure built-in expressions (regexp), JVM-side, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def anonymize_ip(col: Column) -> Column:
    is_v4 = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    v4 = F.regexp_replace(col, r"\.\d{1,3}$", ".0")
    is_v6 = col.contains(":")
    v6 = F.concat(
        F.regexp_extract(col, r"^([0-9A-Fa-f]{0,4}:[0-9A-Fa-f]{0,4})", 1),
        F.lit("::"),
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(is_v4, v4).otherwise(F.when(is_v6, v6).otherwise(col))
    )


def anonymize_ip_sql(expr: str) -> str:
    """DuckDB-equivalent expression for oracle checks."""
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"WHEN regexp_matches({expr}, '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$') "
        f"THEN regexp_replace({expr}, '\\.\\d{{1,3}}$', '.0') "
        f"WHEN contains({expr}, ':') "
        f"THEN regexp_extract({expr}, '^([0-9A-Fa-f]{{0,4}}:[0-9A-Fa-f]{{0,4}})', 1) || '::' "
        f"ELSE {expr} END"
    )
