"""Output projections (P1, S6): the one-line text formatter and the
JSONL field projection.

One-line format follows the reference's CLF-like line (libcommon
``Net::Log::OneLine``, applied at
/root/reference/src/client/ResultWriter.cxx:274-275) with the client's
column toggles (/root/reference/src/client/Main.cxx:262-278):
``show_site``, ``show_host`` (--host), ``show_forwarded_to``,
``no_referer``, ``no_agent``, ``show_content_type``, ``iso8601``.
``show_site`` auto-disables when the query filters exactly one site or
routes to a per-site sink (ResultWriter.cxx:152-163, Main.cxx:361-362).

JSONL (S6): field-per-key objects with absent-if-null semantics
(/root/reference/src/client/FormatJson.cxx:24-88) — Spark's
``df.write.json`` drops null fields, which matches.

Everything is built-in concat/date_format expressions — JVM-side,
whole-stage-codegen'd; at 100 TB the formatter is a pure map stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class OneLineOptions:
    show_site: bool = True
    show_host: bool = False
    show_forwarded_to: bool = False
    show_referer: bool = True
    show_agent: bool = True
    show_content_type: bool = False
    iso8601: bool = False
    anonymize: bool = False


def _q(col: Column) -> Column:
    """CLF-quoted field: ``"value"`` or ``"-"`` when absent."""
    return F.concat(F.lit('"'), F.coalesce(col, F.lit("-")), F.lit('"'))


def _d(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit("-"))


def one_line(opts: OneLineOptions = OneLineOptions()) -> Column:
    """The formatted line as a Column (select it, or feed the text sink).

    Layout (CLF-ish, matching the reference's field order): ``[site]
    remote_host [host] [forwarded_to] - - [timestamp] "METHOD URI" status
    length ["referer"] ["agent"] [content_type]``.
    """
    from pond_spark.functions.anonymize import anonymize_ip

    c = F.col
    ts = (
        F.date_format(c("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        if opts.iso8601
        else F.date_format(c("timestamp"), "dd/MMM/yyyy:HH:mm:ss Z")
    )
    remote = anonymize_ip(c("remote_host")) if opts.anonymize else c("remote_host")

    parts: list[Column] = []
    if opts.show_site:
        parts.append(_d(c("site")))
    parts.append(_d(remote))
    if opts.show_host:
        parts.append(_d(c("host")))
    if opts.show_forwarded_to:
        parts.append(_d(c("forwarded_to")))
    parts += [
        F.lit("-"),
        F.lit("-"),
        F.concat(F.lit("["), F.coalesce(ts, F.lit("-")), F.lit("]")),
        _q(
            F.when(
                c("http_method").isNotNull() | c("http_uri").isNotNull(),
                F.concat_ws(" ", c("http_method"), c("http_uri")),
            )
        ),
        _d(c("http_status")),
        _d(c("length")),
    ]
    if opts.show_referer:
        parts.append(_q(c("http_referer")))
    if opts.show_agent:
        parts.append(_q(c("user_agent")))
    if opts.show_content_type:
        parts.append(_d(c("content_type")))
    return F.concat_ws(" ", *parts).alias("line")


#: JSONL field order per FormatJson.cxx:24-88.
JSON_FIELDS = (
    "timestamp",
    "remote_host",
    "host",
    "site",
    "analytics_id",
    "generator",
    "forwarded_to",
    "http_method",
    "http_uri",
    "http_referer",
    "user_agent",
    "message",
    "http_status",
    "length",
    "content_type",
    "traffic_received",
    "traffic_sent",
    "duration_us",
    "type",
)


def to_json_projection(df: DataFrame) -> DataFrame:
    """Project to the JSONL field set (S6); ``df.write.json`` then
    drops nulls, matching the reference's absent-if-unset keys."""
    cols = [f for f in JSON_FIELDS if f in df.columns]
    return df.select(*cols)
