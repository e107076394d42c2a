"""--geoip (P4): remote_host → 2-letter country code, '-' if unknown.

Reference: /root/reference/src/client/ResultWriter.cxx:177-192 (libgeoip
lookup, http_access records only, '-' fallback; doc/index.rst:206-211).

Spark-first mapping: a **broadcast range join** against an IP-range →
country table — the dimension is a few hundred k rows at most, so it
broadcasts and the probe is a codegen'd range predicate per row; no
shuffle of the fact table. At 100 TB this is the only strategy that
doesn't move the logs.

IPv4 addresses are mapped to a uint32 for the range comparison using
built-in expressions only (split + arithmetic, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad → numeric (NULL for non-IPv4 strings)."""
    is_v4 = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    parts = F.split(col, r"\.")
    num = (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )
    return F.when(is_v4, num)


IPV4_TO_LONG_SQL = (
    "CASE WHEN regexp_matches({c}, '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')"
    " THEN CAST(string_split({c}, '.')[1] AS BIGINT) * 16777216"
    " + CAST(string_split({c}, '.')[2] AS BIGINT) * 65536"
    " + CAST(string_split({c}, '.')[3] AS BIGINT) * 256"
    " + CAST(string_split({c}, '.')[4] AS BIGINT)"
    " ELSE NULL END"
)


def geoip_country(
    df: DataFrame,
    geo: DataFrame,
    host_col: str = "remote_host",
    out_col: str = "country",
) -> DataFrame:
    """Append ``out_col`` via a bucketed broadcast range join.

    ``geo`` columns: ``ip_start BIGINT, ip_end BIGINT (inclusive),
    country STRING``. Unknown / non-IPv4 → ``'-'`` (the reference's
    fallback glyph).

    A naive broadcast range join is a nested-loop probe — O(rows ×
    ranges), unusable against a real GeoIP table (~400k ranges) at log
    scale. Delegates to the generic bucketed strategy
    (operators.rangejoin.range_join) at /16 bucket width: each range
    explodes into the prefix buckets it overlaps (ranges are short, so
    fan-out is tiny) and the probe equi-joins on its own bucket — a
    BroadcastHashJoin with a residual between-predicate."""
    from pond_spark.operators.rangejoin import range_join

    probe = df.withColumn("_ipnum", ipv4_to_long(F.col(host_col)))
    # private dim names throughout: a caller whose frame ALREADY has
    # ip_start/ip_end (e.g. logs enriched once before) must not have
    # its own columns dropped below, nor range_join's collision rename
    # (interval_ip_start) leak into the output
    dim = geo.select(
        F.col("ip_start").alias("_geo_ip_start"),
        F.col("ip_end").alias("_geo_ip_end"),
        F.col("country").alias("_geo_country"),
    )
    joined = range_join(
        probe,
        dim,
        "_ipnum",
        start_col="_geo_ip_start",
        end_col="_geo_ip_end",
        bucket_width=65536.0,
        how="left",
    )
    return (
        joined.withColumn(out_col, F.coalesce(F.col("_geo_country"), F.lit("-")))
        .drop("_ipnum", "_geo_ip_start", "_geo_ip_end", "_geo_country")
    )


def resolve_forwarded_to(
    df: DataFrame, hostnames: DataFrame, col: str = "forwarded_to"
) -> DataFrame:
    """--resolve-forwarded-to (P5): rewrite the backend address to its
    name via a lookup table (the deterministic stand-in for the
    reference's cached reverse resolver,
    /root/reference/src/client/CachedAddressResolver.*). Broadcast hash
    join; unmatched addresses keep the raw value
    (ResultWriter.cxx:246-257 falls back to the unresolved string)."""
    lut = hostnames.select(
        F.col("address").alias("_addr"), F.col("name").alias("_name")
    )
    return (
        df.join(F.broadcast(lut), df[col] == F.col("_addr"), "left")
        .withColumn(col, F.coalesce(F.col("_name"), F.col(col)))
        .drop("_addr", "_name")
    )
