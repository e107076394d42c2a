"""Public-suffix-list registered-domain extraction — the full PSL
semantics (publicsuffix.org/list/ algorithm: normal, wildcard ``*.``
and exception ``!`` rules, longest match wins) behind the
``registered_domain`` surface that urlnorm.py's public-suffix-lite
approximates with ten hard-wired second-level suffixes.

Rule set: :data:`DEFAULT_RULES` bundles a verified snapshot SUBSET of
the Mozilla list (common ICANN TLDs/second-levels plus well-known
private-domain hosts); production loads the full
``public_suffix_list.dat`` via :func:`load_psl_file` — the operator is
rule-set-agnostic.

100 TB shape — ZERO shuffles: the rule set is tiny (the full Mozilla
list is ~9k rules), so matching is a cascade of **broadcast hash
probes**, one per candidate suffix length (exact key = last *i*
labels; wildcard key = ``*.`` + last *i-1* labels). Each probe adds a
(priority, suffix-labels) pair; the prevailing rule — exception beats
all, else most labels, default rule ``*`` when nothing matches — is a
``greatest()`` over the probe structs, computed row-local. The corpus
never shuffles and never explodes; candidate count per row is bounded
by the longest rule (<=5 labels in the real list).

Cites: publicsuffix.org/list/ (the algorithm + the ``*.ck``/``!www.ck``
canonical example); reference has no domain surface (north-star
extension next to functions/urlnorm.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_RULES",
    "PslRules",
    "parse_psl",
    "load_psl_file",
    "psl_domains",
]

#: Verified snapshot subset of the Mozilla public-suffix list —
#: ICANN TLDs + well-known second-level registries + the canonical
#: wildcard/exception pair, plus common private-domain hosts.
#: Production: load the full list with :func:`load_psl_file`.
DEFAULT_RULES: tuple[str, ...] = (
    # generic TLDs
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz",
    "io", "dev", "app", "xyz",
    # country TLDs
    "de", "fr", "it", "nl", "es", "se", "no", "fi", "dk", "pl", "ru",
    "cn", "us", "ca", "ch", "at", "be", "eu", "jp", "uk", "au", "nz",
    "br", "in",
    # second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    # the canonical wildcard + exception pair from the PSL spec
    "*.ck", "!www.ck",
    # well-known private-domain entries
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "pages.dev", "workers.dev", "s3.amazonaws.com", "cloudfront.net",
)


@dataclass(frozen=True)
class PslRules:
    """Parsed rule set.

    ``exact``: (key, prio, ps) for normal + exception rules — key is
    the rule text without markers, ``prio`` orders prevailing-rule
    selection (exception rules get +1000 so they always win — PSL
    algorithm step: "If more than one rule matches, the prevailing
    rule is the one which is an exception rule"), ``ps`` is the
    public-suffix label count the match implies (rule labels, minus
    one for exceptions).
    ``wild``: same triple for ``*.`` rules, keyed by the literal rule
    text (``*.ck``) so the probe can build the same key from its last
    ``i-1`` labels.
    """

    exact: tuple[tuple[str, int, int], ...]
    wild: tuple[tuple[str, int, int], ...]

    @property
    def max_labels(self) -> int:
        ns = [
            (p - 1000 if p >= 1000 else p)
            for _, p, _ in self.exact + self.wild
        ]
        return max(ns) if ns else 1


def parse_psl(lines: Iterable[str]) -> PslRules:
    """Parse ``public_suffix_list.dat`` lines: ``//`` comments and
    blanks skipped, ``*.`` wildcard and ``!`` exception markers
    honored. Rule text is lowercased (the list is already ASCII/
    punycode)."""
    exact: list[tuple[str, int, int]] = []
    wild: list[tuple[str, int, int]] = []
    for raw in lines:
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        # the dat format allows trailing whitespace-separated comments
        line = line.split()[0]
        if line.startswith("!"):
            body = line[1:]
            n = body.count(".") + 1
            # exception: public suffix is the rule minus its first label
            exact.append((body, 1000 + n, n - 1))
        elif line.startswith("*."):
            n = line.count(".") + 1
            wild.append((line, n, n))
        else:
            n = line.count(".") + 1
            exact.append((line, n, n))
    return PslRules(tuple(exact), tuple(wild))


def load_psl_file(path: str) -> PslRules:
    """Load the full Mozilla ``public_suffix_list.dat`` from disk."""
    with open(path, encoding="utf-8") as fh:
        return parse_psl(fh)


_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def psl_domains(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "id",
    rules: PslRules | None = None,
) -> DataFrame:
    """(id, host, ps_labels, domain): PSL public suffix + registered
    domain for a URL or bare-host column.

    ``domain`` is NULL when the host IS a public suffix (nothing is
    registered below it — the PSL algorithm returns no registrable
    part); IPv4 literals and single-label hosts pass through as their
    own domain (the urlnorm.registered_domain convention).
    """
    spark = df.sparkSession
    rules = rules if rules is not None else parse_psl(DEFAULT_RULES)
    k = min(rules.max_labels, 8)

    exact_df = spark.createDataFrame(
        list(rules.exact) or [("\x00none", 0, 0)], "key string, prio int, ps int"
    )
    wild_df = spark.createDataFrame(
        list(rules.wild) or [("\x00none", 0, 0)], "key string, prio int, ps int"
    )

    from pond_spark.functions.urlnorm import (
        _BARE_AUTH_RE,
        _defrag,
        _host_of_auth,
    )

    u = _defrag(F.col(url_col))
    host = F.when(
        u.rlike(_SCHEME_RE), F.regexp_extract(u, _AUTHORITY_RE, 1)
    ).otherwise(
        # schemeless: leading authority run, not the whole string (a
        # path would otherwise pollute the domain — r6 review finding)
        F.regexp_extract(F.regexp_replace(u, r"^//", ""), _BARE_AUTH_RE, 1)
    )
    host = _host_of_auth(host)  # userinfo/port/trailing-dot strips
    out = df.select(
        F.col(id_col),
        host.alias("host"),
        F.split(host, r"\.", -1).alias("_labels"),
    ).withColumn("_n", F.size("_labels"))

    # candidate keys, staged once each (CollapseProject keeps staged
    # columns with >1 use site — PERF_NOTES HOF-vs-CSE rule)
    for i in range(1, k + 1):
        out = out.withColumn(
            f"_c{i}",
            F.when(
                F.col("_n") >= i,
                F.concat_ws(".", F.slice("_labels", -i, i)),
            ),
        )

    # cascade of broadcast probes: exact rule of length i matches _ci;
    # wildcard rule of length i matches '*.' + _c(i-1)
    probes = []
    for i in range(1, k + 1):
        r = F.broadcast(
            exact_df.select(
                F.col("key").alias(f"_k{i}"),
                F.col("prio").alias(f"_p{i}"),
                F.col("ps").alias(f"_s{i}"),
            )
        )
        out = out.join(r, out[f"_c{i}"] == r[f"_k{i}"], "left")
        probes.append((f"_p{i}", f"_s{i}"))
    for i in range(2, k + 1):
        r = F.broadcast(
            wild_df.select(
                F.col("key").alias(f"_wk{i}"),
                F.col("prio").alias(f"_wp{i}"),
                F.col("ps").alias(f"_ws{i}"),
            )
        )
        out = out.join(
            r,
            # a wildcard rule of i labels consumes i host labels: the
            # '*' must match a REAL label, so hosts shorter than the
            # whole rule must not probe (host 'ck' is not matched by
            # '*.ck')
            (out["_n"] >= F.lit(i))
            & (F.concat(F.lit("*."), out[f"_c{i-1}"]) == r[f"_wk{i}"]),
            "left",
        )
        probes.append((f"_wp{i}", f"_ws{i}"))

    # prevailing rule: greatest (prio, ps) struct; default rule '*'
    # (ps=1) when nothing matched — PSL algorithm step 2
    best = F.greatest(
        *[
            F.struct(
                F.coalesce(F.col(p), F.lit(0)).alias("p"),
                F.coalesce(F.col(s), F.lit(1)).alias("s"),
            )
            for p, s in probes
        ],
        F.struct(F.lit(0).alias("p"), F.lit(1).alias("s")),
    )
    is_ip = F.col("host").rlike(r"^\d+\.\d+\.\d+\.\d+$")
    ps = best.getField("s")
    domain = F.when(is_ip | (F.col("_n") <= 1), F.col("host")).otherwise(
        F.when(
            F.col("_n") >= ps + 1,
            F.concat_ws(
                ".", F.slice("_labels", -(ps + F.lit(1)), ps + F.lit(1))
            ),
        )
    )
    return out.select(
        F.col(id_col),
        "host",
        ps.alias("ps_labels"),
        domain.alias("domain"),
    )


def psl_rules_values_sql(rules: PslRules) -> tuple[str, str, int]:
    """(exact VALUES, wild VALUES, max_labels) for the DuckDB twin —
    the SAME encoded rule triples the Spark operator broadcasts."""

    def vals(rows):
        if not rows:
            rows = [("\x00none", 0, 0)]
        return ", ".join(
            "('" + key.replace("'", "''") + f"', {p}, {s})"
            for key, p, s in rows
        )

    return vals(list(rules.exact)), vals(list(rules.wild)), min(rules.max_labels, 8)
