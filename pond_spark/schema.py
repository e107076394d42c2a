"""The one logical table: log records.

Field set and types derive from the reference's JSON projection
(/root/reference/src/client/FormatJson.cxx:24-88) and filter evaluator
(/root/reference/src/Filter.cxx:38-62); see SURVEY.md §1.2. Every field
is optional — the reference's validity flags map to SQL NULL.

``id`` is the monotonic insertion order the reference assigns at
emplace (/root/reference/src/Database.cxx:94); it is the ordering
tiebreaker — the engine's canonical order is ``(timestamp, id)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Record types (reference doc/index.rst:293-303).
RECORD_TYPES = (
    "http_access",
    "http_error",
    "submission",
    "ssh",
    "job",
    "history",
)

#: HTTP method names, in the reference's enum order — the method filter is
#: a uint32 bitmask over this enum (/root/reference/src/Protocol.hxx:153-158).
HTTP_METHODS = (
    "HEAD",
    "GET",
    "POST",
    "PUT",
    "DELETE",
    "OPTIONS",
    "TRACE",
    "PROPFIND",
    "PROPPATCH",
    "MKCOL",
    "COPY",
    "MOVE",
    "LOCK",
    "UNLOCK",
    "REPORT",
    "PATCH",
)

#: RFC-9110-"safe" methods per the reference's unsafe_method filter
#: (/root/reference/src/Filter.cxx:42 delegating to libcommon's
#: http/Method IsSafe): read-only methods.
SAFE_METHODS = ("GET", "HEAD", "OPTIONS", "TRACE", "PROPFIND", "REPORT")

LOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("timestamp", T.TimestampType(), nullable=True),
        T.StructField("remote_host", T.StringType(), nullable=True),
        T.StructField("host", T.StringType(), nullable=True),
        T.StructField("site", T.StringType(), nullable=True),
        T.StructField("analytics_id", T.StringType(), nullable=True),
        T.StructField("generator", T.StringType(), nullable=True),
        T.StructField("forwarded_to", T.StringType(), nullable=True),
        T.StructField("http_method", T.StringType(), nullable=True),
        T.StructField("http_uri", T.StringType(), nullable=True),
        T.StructField("http_referer", T.StringType(), nullable=True),
        T.StructField("user_agent", T.StringType(), nullable=True),
        T.StructField("message", T.StringType(), nullable=True),
        T.StructField("http_status", T.IntegerType(), nullable=True),
        T.StructField("length", T.LongType(), nullable=True),
        T.StructField("content_type", T.StringType(), nullable=True),
        T.StructField("traffic_received", T.LongType(), nullable=True),
        T.StructField("traffic_sent", T.LongType(), nullable=True),
        T.StructField("duration_us", T.LongType(), nullable=True),
        T.StructField("type", T.StringType(), nullable=True),
    ]
)


def empty_logs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], LOG_SCHEMA)


def read_parquet_ts(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, tolerating TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as
    nanos-since-epoch LongType, which we convert to a µs timestamp with
    exact integer division (``div`` — no double rounding; nanos exceed
    2**53). Truncation matches DuckDB's nanos→µs conversion, so oracle
    comparisons stay exact.

    Two documented sharp edges (r4 review): (1) the conf flip is
    SESSION-WIDE and deliberately not restored — Spark reads SQLConf
    lazily at execution, so flipping it back after building this
    (lazy) DataFrame would break the very read it enabled; after the
    first nanos file, later plain ``spark.read.parquet`` calls on
    nanos files return bigint columns instead of raising. (2) the
    bigint branch ASSUMES an int64 ``ts``/``timestamp`` column holds
    NANOS-since-epoch (the testdata contract); a plain int64 of
    millis/micros would be misscaled — convert such columns yourself
    before or instead of using this reader.
    """
    try:
        df = spark.read.parquet(path)
    except Exception:  # PARQUET_TYPE_ILLEGAL on nanos timestamps
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    for f in df.schema.fields:
        if f.name in ("ts", "timestamp") and f.dataType.simpleString() == "bigint":
            df = df.withColumn(
                f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000"))
            )
        elif (
            f.name in ("ts", "timestamp")
            and f.dataType.simpleString() == "timestamp_ntz"
        ):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as NTZ;
            # the session runs UTC, so reinterpreting the wall time as
            # a UTC instant is lossless and matches DuckDB's naive
            # TIMESTAMP semantics. Downstream arithmetic (age_s etc.)
            # needs LTZ — NTZ refuses numeric casts.
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def events_as_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``events`` table to the pond log schema.

    The synthetic ``events`` table (TESTDATA.md) stands in for the pond
    log stream: ``ts`` → timestamp, ``event_id`` → id (insertion order),
    ``event_type`` → site (the low-cardinality grouping key),
    ``user_id`` → remote_host (the per-client key for sessionization /
    accumulate), ``value`` → duration_us-like numeric, ``props`` →
    message. This mapping is what the oracle SQL in __spark_entry__
    mirrors on the DuckDB side.
    """
    df = read_parquet_ts(spark, f"{sf_dir}/events.parquet")
    return df.select(
        F.col("event_id").alias("id"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("site"),
        F.col("user_id").cast("string").alias("remote_host"),
        F.col("value").alias("value"),
        F.col("props").alias("message"),
    )
