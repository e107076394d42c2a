"""k-anonymity suppression for aggregate exports — the privacy
finisher next to functions/anonymize.py (P2) and functions/pii.py:
before an aggregate leaves the engine, every group with fewer than
``k`` members is suppressed — generalized up one level to ``<other>``
and re-tested, and dropped entirely if even the rollup stays under
``k`` — so no published row isolates a small population.

This is the standard minimum-cell-size rule of statistical disclosure
control (the suppression form of k-anonymity, Sweeney 2002): the
reference's analytics exports (per-site text trees, GROUP_SITE pages)
have no such guard, and a 100 TB log store makes rare-combination
re-identification a real concern in anything published downstream.
(Additive-noise differential privacy is a different, non-deterministic
trade — deliberately out of scope for a hash-checked engine.)

Shape: the groupBy the export needed anyway, a threshold split, and —
only when the k-basis is a DISTINCT count (``protect``) — one
null-safe broadcast semi-join of the (small, rare-combo) suppressed
key set back onto the input to recompute exact distinct counts at the
generalized level; summing per-group distinct counts would OVERSTATE
the merged group's population (a user spanning two rare groups counts
twice) and publish cells that are really under k. With a plain row
basis the rollup is a pure sum — no second input pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: replacement label for suppressed dimension values
OTHER = "<other>"


def kanonymize_counts(
    df: DataFrame,
    dims: Sequence[str],
    k: int,
    protect: str | None = None,
) -> DataFrame:
    """Per-``dims`` counts with small groups suppressed:
    ``(*dims, n)`` where every published row's k-basis is >= ``k``.

    Suppressed groups generalize up one level (trailing dims ->
    ``<other>``) and re-test; what still fails collapses into the
    fully-generalized all-``<other>`` row, which is itself DROPPED if
    under ``k`` (published totals then undercount — that is the
    disclosure-control trade, not a bug). ``protect`` names a column
    whose DISTINCT count is the k-basis instead of the row count (the
    user-level rule: one chatty user must not keep their rare group
    publishable)."""
    if not dims:
        raise ValueError("kanonymize_counts needs at least one dim")
    if k < 1:
        raise ValueError("k must be >= 1")

    def agg_at(frame: DataFrame, keys: list) -> DataFrame:
        basis = (
            F.count_distinct(F.col(protect)) if protect else F.count(F.lit(1))
        ).alias("_basis")
        return frame.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"), basis
        )

    # persisted (r11, guide §2.4): the group-level aggregate feeds the
    # keep/suppress split AND (via sup) both suppressed_rows() call
    # sites — unpinned, every consumer re-ran the full input
    # aggregation. Group-cardinality-sized, tiny. Session pin, cleared
    # by loop drivers (the ngram-pin contract).
    g = agg_at(df, list(dims)).persist()
    keep = g.filter(F.col("_basis") >= k).select(*dims, "n")
    sup = g.filter(F.col("_basis") < k)

    lead, trail = dims[0], list(dims[1:])

    _sr_cache: list[DataFrame] = []

    def suppressed_rows() -> DataFrame:
        """Input rows belonging to suppressed groups (null-safe keys,
        broadcast — the rare-combo key set is small by definition).
        Persisted on first use: with ``protect`` + trailing dims it is
        consumed by BOTH the generalized re-aggregation and the
        catchall basis (two full input scans without the pin)."""
        if _sr_cache:
            return _sr_cache[0]
        cond = reduce(
            lambda a, b: a & b,
            [df[d].eqNullSafe(sup[d]) for d in dims],
        )
        sr = df.alias("_raw").join(
            F.broadcast(sup.select(*dims)), cond, "left_semi"
        ).persist()
        _sr_cache.append(sr)
        return sr

    if trail:
        if protect:
            partial = agg_at(suppressed_rows(), [lead])
        else:
            partial = (
                sup.groupBy(lead)
                .agg(F.sum("n").alias("n"), F.sum("_basis").alias("_basis"))
            )
        partial = partial.select(
            F.col(lead), *[F.lit(OTHER).alias(d) for d in trail], "n", "_basis"
        )
        keep2 = partial.filter(F.col("_basis") >= k).select(*dims, "n")
        rest = partial.filter(F.col("_basis") < k)
        out = keep.unionByName(keep2)
    else:
        rest = sup
        out = keep

    if protect:
        # exact distinct basis for the final bucket: re-aggregate the
        # rows of the still-suppressed groups. Summing per-group
        # distinct counts would overstate the pooled population (a
        # `protect` value spanning several suppressed groups counts
        # once per group) and publish an all-<other> cell whose true
        # distinct count is under k — this holds with or without
        # trailing dims, so the join-back runs in both shapes.
        if trail:
            # null-SAFE join-back (r7 review fix): a plain [lead]
            # semi-join silently dropped NULL-lead suppressed rows
            # from the final bucket's basis, while the SQL twin's
            # IS NOT DISTINCT FROM counted them — cross-engine
            # divergence AND an understated catchall
            sr = suppressed_rows()
            rest_leads = rest.select(lead)
            rest_rows = sr.join(
                F.broadcast(rest_leads),
                sr[lead].eqNullSafe(rest_leads[lead]),
                "left_semi",
            )
        else:
            rest_rows = suppressed_rows()
        catch = rest_rows.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(protect)).alias("_basis"),
        )
    else:
        catch = rest.agg(
            F.sum("n").alias("n"), F.sum("_basis").alias("_basis")
        )
    catchall = (
        catch.filter(F.col("_basis") >= k)
        .select(
            *[F.lit(OTHER).alias(d) for d in dims],
            F.col("n").cast("long").alias("n"),
        )
    )
    return out.unionByName(catchall)


def kanonymize_counts_sql(
    table_expr: str,
    dims: Sequence[str],
    k: int,
    protect: str | None = None,
) -> str:
    """DuckDB twin — identical grouping, thresholds, null-safe
    suppressed-row recovery and rollup."""
    dimlist = ", ".join(dims)
    basis = f"count(DISTINCT {protect})" if protect else "count(*)"
    lead, trail = dims[0], list(dims[1:])
    other_trail = ", ".join(f"'{OTHER}' AS {d}" for d in trail)
    other_all = ", ".join(f"'{OTHER}' AS {d}" for d in dims)
    nullsafe = " AND ".join(
        f"r.{d} IS NOT DISTINCT FROM s.{d}" for d in dims
    )

    sup_rows = f"""
sup_rows AS (SELECT r.* FROM src r
             WHERE EXISTS (SELECT 1 FROM sup s WHERE {nullsafe}))"""

    if trail:
        if protect:
            partial_def = f"""
partial AS (SELECT {lead}, {other_trail}, CAST(count(*) AS BIGINT) AS n,
                   count(DISTINCT {protect}) AS b
            FROM sup_rows GROUP BY {lead})"""
        else:
            partial_def = f"""
partial AS (SELECT {lead}, {other_trail}, CAST(sum(n) AS BIGINT) AS n,
                   sum(b) AS b
            FROM sup GROUP BY {lead})"""
        keep2 = f"keep2 AS (SELECT {dimlist}, n FROM partial WHERE b >= {k})"
        if protect:
            catch_def = f"""
catch AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 count(DISTINCT {protect}) AS b
          FROM sup_rows r WHERE EXISTS
            (SELECT 1 FROM partial p WHERE p.b < {k}
             AND r.{lead} IS NOT DISTINCT FROM p.{lead}))"""
        else:
            catch_def = f"""
catch AS (SELECT CAST(sum(n) AS BIGINT) AS n, sum(b) AS b
          FROM partial WHERE b < {k})"""
        keep2_union = "SELECT * FROM keep2 UNION ALL "
        mid = f"{partial_def},\n{keep2},\n{catch_def},"
    elif protect:
        # single dim + protect: pool the suppressed rows and recount
        # the distinct basis exactly (mirror of the DataFrame branch)
        mid = f"""
catch AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 count(DISTINCT {protect}) AS b FROM sup_rows),"""
        keep2_union = ""
    else:
        mid = f"""
catch AS (SELECT CAST(sum(n) AS BIGINT) AS n, sum(b) AS b FROM sup),"""
        keep2_union = ""
    return f"""
WITH src AS (SELECT * FROM {table_expr}),
g AS (SELECT {dimlist}, CAST(count(*) AS BIGINT) AS n, {basis} AS b
      FROM src GROUP BY {dimlist}),
keep AS (SELECT {dimlist}, n FROM g WHERE b >= {k}),
sup AS (SELECT * FROM g WHERE b < {k}),{sup_rows},{mid}
catchall AS (SELECT {other_all}, n FROM catch WHERE b >= {k})
SELECT * FROM keep UNION ALL {keep2_union}SELECT * FROM catchall
"""
