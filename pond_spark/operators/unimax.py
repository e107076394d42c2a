"""UniMax-style epoch-capped corpus budget allocation (Chung et al.
2023, "UniMax: Fairer and More Effective Language Sampling for
Large-Scale Multilingual Pretraining") — decide how much of each
language slice a training mix gets, given a total token budget and a
cap on how many times any slice may be repeated (epochs).

The paper's sequential waterfilling (fund the smallest languages
fully, split what remains evenly) has a closed form: sort languages
by capacity ascending; the fully-funded set is the largest prefix
``k*`` where ``cap_k * (L - k + 1) <= T - prefix_{k-1}`` (language k
still fits fully if the remaining budget split over the remaining
languages covers its cap); everything after ``k*`` gets the floor-even
share of the leftover. That is two window passes over an L-row
language frame — no iteration, exact int64 arithmetic throughout, so
allocation and selection hash identically cross-engine.

Selection then materializes each language's quota deterministically:
docs ordered by the repo's portable affine shuffle key (seed-stable,
the reproducible_shuffle family), kept while the per-language running
size stays inside the quota — one window over a language-keyed
exchange; at 100 TB this is a single shuffle of (id, lang, size)
triples, never documents.

This is the budgeted-counterpart of temperature_mixture
(operators/sampling.py): temperature reweights *rates*, UniMax
allocates an absolute token budget with a hard repetition cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unimax_quotas", "unimax_select", "unimax_quotas_sql"]

#: affine shuffle-key constants — the packing.reproducible_shuffle family
UX_A, UX_C, UX_MOD = 48_271, 2_654_435_761, 1_000_000_007


def unimax_quotas(
    docs: DataFrame,
    budget: int,
    epochs: int,
    lang_col: str = "lang",
    size_col: str = "n_chars",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Per-language budget: ``(lang, size, cap, quota)`` with
    ``cap = epochs * size`` and Σ quota ≤ budget. NULL-lang/size rows
    are excluded from the corpus being budgeted.

    ``sizes`` (r11, guide §1.2): a precomputed ``(lang, size)``
    per-language frame — callers that already aggregated the corpus
    (e.g. to derive the budget from the total) pass it here so the
    docs scan + groupBy is not recomputed. Must equal exactly what
    the internal aggregation would produce."""
    from pyspark.sql.window import Window

    if sizes is None:
        sizes = (
            docs.filter(
                F.col(lang_col).isNotNull() & F.col(size_col).isNotNull()
            )
            .groupBy(F.col(lang_col).alias("lang"))
            .agg(F.sum(size_col).cast("long").alias("size"))
        )
    sizes = sizes.select("lang", "size").withColumn(
        "cap", F.lit(epochs) * F.col("size")
    )
    # deterministic waterfilling order: capacity asc, lang asc
    w = Window.orderBy("cap", "lang")
    ranked = (
        sizes.withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "prefix",
            F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("L", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    # language i is fully funded iff its cap fits the even split of
    # what the smaller languages left over
    flagged = ranked.withColumn(
        "funded",
        F.col("cap") * (F.col("L") - F.col("i") + 1)
        <= F.lit(budget) - (F.col("prefix") - F.col("cap")),
    )
    kstar = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("funded"), F.col("i"))), F.lit(0)
        ).alias("k"),
        F.coalesce(
            F.max(F.when(F.col("funded"), F.col("prefix"))), F.lit(0)
        ).alias("spent"),
    )
    return (
        flagged.crossJoin(F.broadcast(kstar))
        .select(
            "lang",
            "size",
            "cap",
            F.when(F.col("i") <= F.col("k"), F.col("cap"))
            .otherwise(
                # greatest(...,1) guards the k == L case (all funded:
                # the branch is never taken, but ANSI mode would still
                # reject a reachable /0)
                F.expr(
                    f"CAST({budget} - spent AS BIGINT) "
                    "div greatest(L - k, 1)"
                )
            )
            .alias("quota"),
        )
        .withColumn("quota", F.greatest(F.col("quota"), F.lit(0).cast("long")))
    )


def unimax_select(
    docs: DataFrame,
    budget: int,
    epochs: int,
    seed: int = 1,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    size_col: str = "n_chars",
    quotas: DataFrame | None = None,
) -> DataFrame:
    """Materialize the allocation: the deterministic document subset
    whose per-language running size stays inside each quota, in
    seed-stable shuffle-key order. Returns
    ``(doc_id, lang, size, shuffle_key)``. Quota may exceed a
    language's corpus (epochs > 1): selection is capped at one copy —
    repetition factors are the trainer's concern; this picks the set.

    ``quotas`` (r11, guide §1.2): a precomputed ``unimax_quotas``
    frame — callers that also report the quota table pass it here so
    the sizes aggregation + waterfilling windows run once, not twice."""
    from pyspark.sql.window import Window

    if quotas is None:
        quotas = unimax_quotas(docs, budget, epochs, lang_col, size_col)
    keyed = docs.filter(
        F.col(lang_col).isNotNull() & F.col(size_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.col(size_col).cast("long").alias("size"),
        F.pmod(
            F.col(id_col) * F.lit(UX_A) + F.lit(seed) * F.lit(UX_C),
            F.lit(UX_MOD),
        ).alias("shuffle_key"),
    )
    w = Window.partitionBy("lang").orderBy("shuffle_key", id_col)
    running = keyed.withColumn(
        "_run",
        F.sum("size").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        running.join(F.broadcast(quotas.select("lang", "quota")), "lang")
        .filter(F.col("_run") <= F.col("quota"))
        .select(id_col, "lang", "size", "shuffle_key")
    )


def unimax_quotas_sql(
    budget: int | str,
    epochs: int,
    table: str = "documents",
    lang_col: str = "lang",
    size_col: str = "n_chars",
    as_with_quotas: bool = False,
) -> str:
    """DuckDB twin of ``unimax_quotas`` — identical closed form.
    ``budget`` may be an int or a parenthesized scalar-subquery string.
    With ``as_with_quotas`` the final projection is emitted as a
    ``quotas`` CTE (no trailing SELECT) so callers can append their
    own CTEs — string surgery on the returned SQL is not supported
    (the budget subquery itself contains SELECT)."""
    head = f"""
WITH sizes AS (
  SELECT {lang_col} AS lang, CAST(sum({size_col}) AS BIGINT) AS size,
         {epochs} * CAST(sum({size_col}) AS BIGINT) AS cap
  FROM {table}
  WHERE {lang_col} IS NOT NULL AND {size_col} IS NOT NULL
  GROUP BY 1),
ranked AS (
  SELECT lang, size, cap,
         CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT) AS i,
         CAST(sum(cap) OVER (ORDER BY cap, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS prefix,
         CAST(count(*) OVER () AS BIGINT) AS L
  FROM sizes),
flagged AS (
  SELECT *, cap * (L - i + 1) <= {budget} - (prefix - cap) AS funded
  FROM ranked),
kstar AS (
  SELECT COALESCE(max(CASE WHEN funded THEN i END), 0) AS k,
         COALESCE(max(CASE WHEN funded THEN prefix END), 0) AS spent
  FROM flagged)"""
    final = f"""
SELECT lang, size, cap,
       CAST(greatest(CASE WHEN i <= k THEN cap
                     ELSE ({budget} - spent) // greatest(L - k, 1) END,
                0) AS BIGINT) AS quota
FROM flagged CROSS JOIN kstar"""
    if as_with_quotas:
        return f"{head},\nquotas AS ({final}\n)"
    return head + final + "\n"
