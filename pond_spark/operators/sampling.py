"""Deterministic sampling and mixture construction for training-data
curation.

``sample`` / ``stratified_sample`` use hash-bucket selection — a
universal hash ``h(id) = (a * (id mod p) + b) mod p`` (Mersenne-31,
the same family minhash permutations use) reduced to a bucket in
``[0, DENOM)``, kept when the bucket falls under ``rate * DENOM``.
Not Bernoulli RNG: the kept set is a pure function of ids —
independent of partitioning, task retries, or row order — so runs
reproduce across cluster shapes, and the arithmetic is plain enough
that the DuckDB oracle replays the selection bit-for-bit (no
engine-specific hash functions in the path). A consistent hash sample
also composes: the 1% sample is a subset of the 10% sample under the
same salt.

``mixture`` builds a weighted training mix across sources from one
table, the shape of a pre-training mixture job (e.g. 3.0x wikipedia,
0.1x common-crawl): integer weights replicate rows (with an ``epoch``
column), fractional parts hash-sample.

All operators are single-scan, map-only expressions — no shuffle, no
RNG state; the sample filters sit directly on the scan so Catalyst
pushes them down. Ids must be integral (the standard case); string
keys should be pre-hashed to int64 by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pond_spark.dedup.minhash import MERSENNE_P, _perm_params

#: hash-bucket denominator: rates resolve to integer bucket thresholds
#: out of this many buckets (1e6 → rate granularity 1e-6)
DENOM = 1_000_000


def _salt_params(salt: str) -> tuple[int, int]:
    """Deterministic (a, b) for a salt string — seeded from a sha256 of
    the WHOLE salt via the same splitmix stream the minhash
    permutations use. (The r4 review caught the previous first-8-bytes
    seed: salts sharing an 8-byte prefix — 'experiment1' vs
    'experiment2' — produced bit-identical "independent" samples.)"""
    import hashlib

    seed = int.from_bytes(
        hashlib.sha256(salt.encode("utf-8")).digest()[:8], "big"
    )
    return _perm_params(1, seed)[0]


def _threshold(rate: float) -> int:
    """rate → integer bucket threshold; round() not int(): float
    representation error (0.29*1e6 = 289999.99…) must not silently
    shave a bucket off the documented fraction."""
    return int(round(rate * DENOM))


def _bucket(id_col: Column, salt: str) -> Column:
    a, b = _salt_params(salt)
    h = (F.lit(a) * F.pmod(id_col.cast("long"), F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(
        MERSENNE_P
    )
    return F.pmod(h, F.lit(DENOM))


def _sql_str(v: str) -> str:
    """Single-quote-escaped SQL string literal (the funnel.py q()
    rule): a stratum value like "it's" must not break — or inject
    into — the generated oracle predicate (r6 review finding)."""
    return "'" + str(v).replace("'", "''") + "'"


def _bucket_sql(id_expr: str, salt: str) -> str:
    a, b = _salt_params(salt)
    # the inner/outer % must be PMOD like the Spark side: DuckDB's %
    # is sign-preserving, so a negative id would get a negative bucket
    # and pass `bucket < threshold` at ANY rate (r6 review finding —
    # the bit-for-bit parity contract broke for negative ids)
    inner = f"((CAST({id_expr} AS BIGINT) % {MERSENNE_P}) + {MERSENNE_P}) % {MERSENNE_P}"
    mid = f"((({a} * ({inner}) + {b}) % {MERSENNE_P}) + {MERSENNE_P}) % {MERSENNE_P}"
    return f"(({mid}) % {DENOM})"


def sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic ``rate``-fraction sample by id hash: exactly the
    rows whose bucket falls under ``rate * DENOM`` — reproducible
    anywhere, monotone in ``rate`` for a fixed salt (a smaller rate
    yields a subset of a larger one)."""
    return df.filter(_bucket(F.col(id_col), salt) < _threshold(rate))


def sample_sql(
    rate: float, id_expr: str = "doc_id", salt: str = "sample"
) -> str:
    """DuckDB twin of ``sample``'s keep predicate."""
    return f"{_bucket_sql(id_expr, salt)} < {_threshold(rate)}"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum
    value → keep fraction; unlisted strata keep ``default_rate``. One
    scan, one filter — the rate lookup is a literal CASE chain, so
    Catalyst folds it into the pushed-down predicate."""
    rate = F.lit(_threshold(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == value, F.lit(_threshold(r))
        ).otherwise(rate)
    return df.filter(_bucket(F.col(id_col), salt) < rate)


def stratified_sample_sql(
    rates: dict[str, float],
    stratum_expr: str = "lang",
    id_expr: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> str:
    whens = " ".join(
        f"WHEN {stratum_expr} = {_sql_str(v)} THEN {_threshold(r)}"
        for v, r in sorted(rates.items())
    )
    case = f"(CASE {whens} ELSE {_threshold(default_rate)} END)"
    return f"{_bucket_sql(id_expr, salt)} < {case}"


def mixture(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted training mixture: weight w yields floor(w) full copies
    of each source row plus a (w - floor(w)) hash-sampled fractional
    copy; an ``epoch`` column (0-based) distinguishes replicas so
    downstream dedup steps don't collapse them. Replication is an
    explode over a literal sequence — map-only, no shuffle. Sources
    not listed in ``weights`` get weight 0 (dropped)."""
    n_full = F.lit(0)
    frac = F.lit(0)
    for value, w in sorted(weights.items()):
        n_full = F.when(F.col(source_col) == value, F.lit(int(w))).otherwise(n_full)
        frac = F.when(
            F.col(source_col) == value, F.lit(int(round((w - int(w)) * DENOM)))
        ).otherwise(frac)
    keep_frac = _bucket(F.col(id_col), salt) < frac
    n_copies = n_full + F.when(keep_frac, 1).otherwise(0)
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def mixture_sql(
    weights: dict[str, float],
    table: str = "documents",
    source_expr: str = "source",
    id_expr: str = "doc_id",
    salt: str = "mix",
    cols: str = "*",
) -> str:
    """DuckDB twin: same copy-count arithmetic, replicas via a
    generate_series lateral join."""
    n_full = " ".join(
        f"WHEN {source_expr} = {_sql_str(v)} THEN {int(w)}"
        for v, w in sorted(weights.items())
    )
    frac = " ".join(
        f"WHEN {source_expr} = {_sql_str(v)} THEN {int(round((w - int(w)) * DENOM))}"
        for v, w in sorted(weights.items())
    )
    n_copies = (
        f"(CASE {n_full} ELSE 0 END) + (CASE WHEN {_bucket_sql(id_expr, salt)} "
        f"< (CASE {frac} ELSE 0 END) THEN 1 ELSE 0 END)"
    )
    return f"""
SELECT {cols}, CAST(e.epoch AS BIGINT) AS epoch
FROM (SELECT *, {n_copies} AS _n FROM {table}) t,
     LATERAL (SELECT unnest(generate_series(0, t._n - 1)) AS epoch) e
WHERE t._n > 0
"""


def temperature_weights(
    counts: dict[str, int], alpha: float = 0.7
) -> dict[str, float]:
    """Temperature-resampling rates (the multilingual-mixture rule of
    XLM-R / mBERT, Conneau et al. 2020 §3.1): sample stratum s with
    probability ∝ n_s^alpha. Expressed as per-row acceptance rates
    normalized so the SMALLEST stratum keeps everything —
    ``r_s = (n_s / n_min)^(alpha-1)`` — i.e. alpha < 1 downsamples the
    head instead of upsampling the tail (no replica epochs). Pure
    Python over the (small) stratum counts, shared verbatim by the
    engine wrapper and the oracle SQL builder so both embed identical
    thresholds."""
    if not 0 <= alpha <= 1:
        raise ValueError("alpha in [0, 1]: 1 = proportional, 0 = uniform")
    nmin = min(counts.values())
    return {s: (n / nmin) ** (alpha - 1.0) for s, n in counts.items()}


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Data-derived :func:`mixture`: stratum counts (one bounded
    aggregate — strata are languages/sources, a handful of rows) feed
    temperature_weights, then the deterministic hash-sampled mixture
    applies them. The head-stratum downsampling this produces is the
    standard fix for majority-language dominance in multilingual
    corpora."""
    # a NULL stratum cannot carry a rate (and would crash the sorted()
    # over weight keys): NULL-source rows get weight 0 — dropped, the
    # same rule mixture applies to any unlisted source
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return mixture(df, {}, source_col, id_col, salt)
    return mixture(
        df, temperature_weights(counts, alpha), source_col, id_col, salt
    )
