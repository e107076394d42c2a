"""URL normalization and registered-domain extraction.

Web-crawl pipelines dedup and group by *canonical* URL: scheme and
host case-folded, default ports stripped, fragments dropped, tracking
parameters removed, remaining query parameters sorted. The same
normalization is the key for URL-level dedup (one fetch per canonical
URL) and for host/domain-level mixture statistics (docs per registered
domain — a standard crawl-quality signal).

Everything here is pure built-in expressions (regexp + array lambdas)
— whole-stage codegen, no Python, no shuffle; safe to run inline in a
100 TB scan. The DuckDB oracle twins use byte-identical regexes.

The registered-domain rule is a deliberately small public-suffix-lite:
two labels, or three when the last two are a well-known second-level
suffix (co.uk, com.au, …). A production system would load the full
Mozilla public-suffix list as a broadcast lookup; the *shape* (pure
expression, no join) is the 100 TB path either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_url", "registered_domain", "TRACKING_PARAMS"]

#: query parameters that never affect content (ad/analytics trackers)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "igshid", "mc_eid")

#: well-known second-level public suffixes (public-suffix-lite)
SECOND_LEVEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "com.au",
    "net.au",
    "org.au",
    "co.jp",
    "co.nz",
    "com.br",
    "co.in",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
#: schemeless forms: authority is the leading run, path follows it
_BARE_AUTH_RE = r"^([^/?#]+)"
_BARE_PATH_RE = r"^[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_FRAG_RE = r"#.*$"


def _defrag(url: Column) -> Column:
    """Drop the fragment BEFORE any other parsing: an unanchored query
    regex would otherwise pick up a '?' INSIDE the fragment and
    resurface fragment text as the query string (r6 review finding —
    'page#a?x=1' normalized to 'page?x=1')."""
    return F.regexp_replace(url, _FRAG_RE, "")


def _host_of_auth(authority: Column) -> Column:
    """Host from an authority component: strip userinfo ('user:pass@'
    would otherwise be taken as the host via the port-strip
    substring_index), strip the port, lowercase, and drop a trailing
    FQDN dot ('example.com.' must group with 'example.com', not under
    a bogus 'com.' bucket) — all r6 review findings."""
    host = F.substring_index(authority, "@", -1)
    host = F.lower(F.substring_index(host, ":", 1))
    return F.regexp_replace(host, r"\.$", "")


def _is_tracking(param: Column) -> Column:
    name = F.substring_index(param, "=", 1)
    cond = name.startswith("utm_")
    for p in TRACKING_PARAMS:
        cond = cond | (name == F.lit(p))
    return cond | (param == F.lit(""))


def normalize_url(url: Column) -> Column:
    """Canonical form: lowercased scheme/host, userinfo dropped,
    default port stripped, trailing host dot dropped, fragment
    dropped, tracking params removed, query params sorted, empty path
    → ``/``. Ports other than the scheme default survive. Schemeless
    inputs ('example.com/x', '//host/p') normalize WITHOUT a scheme
    prefix — the old scheme-anchored regexes collapsed every such URL
    to ':///' (r6 review finding)."""
    u = _defrag(url)
    has_scheme = u.rlike(_SCHEME_RE)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    u_bare = F.regexp_replace(u, r"^//", "")  # protocol-relative
    authority = F.lower(
        F.when(has_scheme, F.regexp_extract(u, _AUTHORITY_RE, 1)).otherwise(
            F.regexp_extract(u_bare, _BARE_AUTH_RE, 1)
        )
    )
    hostport = F.substring_index(authority, "@", -1)
    hostport = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    host = F.concat(
        F.regexp_replace(F.substring_index(hostport, ":", 1), r"\.$", ""),
        F.when(
            hostport.contains(":"),
            F.concat(F.lit(":"), F.substring_index(hostport, ":", -1)),
        ).otherwise(F.lit("")),
    )
    path = F.when(has_scheme, F.regexp_extract(u, _PATH_RE, 1)).otherwise(
        F.regexp_extract(u_bare, _BARE_PATH_RE, 1)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&", -1), lambda p: ~_is_tracking(p)
            )
        ),
        "&",
    )
    return F.concat(
        F.when(has_scheme, F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )


def normalize_urls(
    df,
    url_col: str = "url",
    keep_cols: tuple[str, ...] = ("id",),
    norm_col: str = "url_norm",
    domain_col: str = "domain",
):
    """DataFrame twin of :func:`normalize_url` + :func:`registered_domain`
    with staged projections.

    The Column API re-derives the scheme/authority regexp extracts
    inside every use site (Spark's subexpression elimination doesn't
    merge them once lambdas are involved), which measured 2.8 s at
    sf0.1; staging each extract exactly once in intermediate selects
    that survive CollapseProject brings the same plan under 0.5 s.
    """
    kept = [F.col(c) for c in keep_cols]
    u = F.col("_u")
    ub = F.col("_ub")
    s0 = df.select(
        *kept, _defrag(F.col(url_col)).alias("_u")
    ).select(
        *kept,
        u,
        u.rlike(_SCHEME_RE).alias("_schemed"),
        F.regexp_replace(u, r"^//", "").alias("_ub"),
    )
    s1 = s0.select(
        *kept,
        F.when(
            F.col("_schemed"),
            F.concat(F.lower(F.regexp_extract(u, _SCHEME_RE, 1)), F.lit("://")),
        )
        .otherwise(F.lit(""))
        .alias("_scheme"),
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("_rawscheme"),
        F.substring_index(
            F.lower(
                F.when(
                    F.col("_schemed"), F.regexp_extract(u, _AUTHORITY_RE, 1)
                ).otherwise(F.regexp_extract(ub, _BARE_AUTH_RE, 1))
            ),
            "@",
            -1,
        ).alias("_auth"),
        F.when(
            F.col("_schemed"), F.regexp_extract(u, _PATH_RE, 1)
        )
        .otherwise(F.regexp_extract(ub, _BARE_PATH_RE, 1))
        .alias("_path0"),
        F.regexp_extract(u, _QUERY_RE, 1).alias("_q"),
    )
    hostport = (
        F.when(
            F.col("_rawscheme") == "https",
            F.regexp_replace(F.col("_auth"), ":443$", ""),
        )
        .when(
            F.col("_rawscheme") == "http",
            F.regexp_replace(F.col("_auth"), ":80$", ""),
        )
        .otherwise(F.col("_auth"))
    )
    s1b = s1.select(
        *kept,
        "_scheme",
        "_path0",
        "_q",
        hostport.alias("_hp"),
        F.regexp_replace(
            F.substring_index(F.col("_auth"), ":", 1), r"\.$", ""
        ).alias("_dhost"),
    )
    s2 = s1b.select(
        *kept,
        F.col("_scheme"),
        F.concat(
            F.regexp_replace(F.substring_index(F.col("_hp"), ":", 1), r"\.$", ""),
            F.when(
                F.col("_hp").contains(":"),
                F.concat(F.lit(":"), F.substring_index(F.col("_hp"), ":", -1)),
            ).otherwise(F.lit("")),
        ).alias("_host"),
        F.when(F.col("_path0") == "", F.lit("/"))
        .otherwise(F.col("_path0"))
        .alias("_path"),
        F.array_join(
            F.array_sort(
                F.filter(F.split(F.col("_q"), "&", -1), lambda p: ~_is_tracking(p))
            ),
            "&",
        ).alias("_params"),
        F.split(F.col("_dhost"), r"\.", -1).alias("_labels"),
        F.col("_dhost"),
    )
    last2 = F.concat_ws(".", F.slice(F.col("_labels"), -2, 2))
    is_2l = F.lit(False)
    for s in SECOND_LEVEL_SUFFIXES:
        is_2l = is_2l | (last2 == F.lit(s))
    n = F.size("_labels")
    # stage `take` too: inlining it duplicates the 10-suffix
    # comparison tree into both slice() arguments (measured 2x)
    s3 = s2.select(
        *kept,
        "_scheme",
        "_host",
        "_path",
        "_params",
        "_labels",
        "_dhost",
        F.when(is_2l & (n >= 3), F.lit(3))
        .otherwise(F.least(n, F.lit(2)))
        .alias("_take"),
    )
    is_ip = F.col("_dhost").rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return s3.select(
        *kept,
        F.concat(
            F.col("_scheme"),
            F.col("_host"),
            F.col("_path"),
            F.when(
                F.col("_params") != "", F.concat(F.lit("?"), F.col("_params"))
            ).otherwise(F.lit("")),
        ).alias(norm_col),
        F.when(is_ip | (F.size("_labels") <= 1), F.col("_dhost"))
        .otherwise(
            F.concat_ws(
                ".", F.slice(F.col("_labels"), -F.col("_take"), F.col("_take"))
            )
        )
        .alias(domain_col),
    )


def registered_domain(url_or_host: Column) -> Column:
    """Registered domain of a URL or bare host (public-suffix-lite).

    ``www.news.example.co.uk`` → ``example.co.uk``;
    ``sub.example.com`` → ``example.com``; IPs and single-label hosts
    pass through unchanged.
    """
    u = _defrag(url_or_host)
    host = F.when(
        u.rlike(_SCHEME_RE),
        F.regexp_extract(u, _AUTHORITY_RE, 1),
    ).otherwise(
        # bare host or schemeless URL: the authority is the leading
        # run — taking the WHOLE string as host let a schemeless
        # URL's path pollute the domain ('other.org/path?a=1')
        F.regexp_extract(F.regexp_replace(u, r"^//", ""), _BARE_AUTH_RE, 1)
    )
    host = _host_of_auth(host)  # userinfo/port/trailing-dot strips
    labels = F.split(host, r"\.", -1)
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    is_2l = F.lit(False)
    for s in SECOND_LEVEL_SUFFIXES:
        is_2l = is_2l | (last2 == F.lit(s))
    take = F.when(is_2l & (n >= 3), F.lit(3)).otherwise(
        F.least(n, F.lit(2))
    )
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return F.when(is_ip | (n <= 1), host).otherwise(
        F.concat_ws(".", F.slice(labels, -take, take))
    )
