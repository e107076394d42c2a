"""Skew mitigation: salted joins for hot keys.

When the build side is too large to broadcast and the probe side has
hot keys (one site, one visitor, one boilerplate band dominating), a
plain shuffle join sends every hot-key row to one task. AQE's
skew-join splitting handles sort-merge joins after the fact; explicit
salting is the plan-level fix that also works for hash joins and keeps
task sizes bounded by construction:

- probe side: add ``_salt = pmod(hash(whole row id cols), salt)``;
- build side: replicate each row ``salt`` times (explode a literal
  range — the build side grows by the salt factor, bounded and known);
- join on ``(key, _salt)`` — each former hot-key task becomes
  ``salt`` tasks.

The engine's own joins prefer broadcast (dims) or ids-only bucket
joins (dedup); this utility is for the residual case — medium-size
build sides against skewed facts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with ``salt``-way key
    splitting. Result equals ``probe.join(build, on, how)``; build-side
    rows are replicated ``salt`` times. ``how`` ∈ {inner, left}.

    ``salt_cols``: the probe columns hashed to pick a salt — they must
    vary WITHIN a hot key (the join keys alone would map a hot key to
    one salt, splitting nothing). Pass the cheap row-identity columns
    (e.g. the other id of a pair); the default hashes every probe
    column, which is correct but pays a per-row pass over the widest
    column (shingle arrays, vectors) for no extra splitting."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    pcols = list(salt_cols) if salt_cols is not None else list(probe.columns)
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in pcols]), F.lit(salt))
    )
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_probe.join(salted_build, [*on, "_salt"], how)
    return out.drop("_salt")
