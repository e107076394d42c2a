"""Visitor tracking (P3) — sessionization with a 30-minute idle timeout.

Reference: /root/reference/src/client/VisitorTracker.hxx:15-52 and
VisitorTracker.cxx:14-44 — assign an opaque visitor id per
``remote_host``; a visitor "expires" when idle longer than 30 minutes,
after which the same host gets a fresh id. Ids are scoped to one output
file (reset per site file, ResultWriter.cxx:358-362); only http_access
records with host+timestamp participate (ResultWriter.cxx:292-301).

Spark-first mapping: the classic gaps-and-islands window — ``lag(ts)
over (partition by scope, remote_host order by ts, id)``, mark a break
when the gap exceeds the timeout, running ``sum`` of breaks gives a
per-host session ordinal; the visitor id is then ``(scope, host,
ordinal)`` hashed to an opaque token. At 100 TB this shuffles once on
``(scope, remote_host)`` — the minimum possible for the semantics —
and each host's history is processed within one partition.

For streaming, ``session_window(ts, '30 minutes')`` gives the same
grouping natively (see pond_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_TIMEOUT_S = 30 * 60  # VisitorTracker.hxx:16-27


def track_visitors(
    df: DataFrame,
    ts_col: str = "timestamp",
    id_col: str = "id",
    host_col: str = "remote_host",
    scope_col: str | None = None,
    timeout_s: int = SESSION_TIMEOUT_S,
    opaque: bool = True,
    type_col: str = "type",
) -> DataFrame:
    """Append a ``visitor_id`` column.

    Participation (ResultWriter.cxx:292-301): only ``http_access``
    records carrying BOTH a host and a timestamp are tracked; every
    other record gets a NULL ``visitor_id`` (the one-line sink prints
    ``-`` for it). When the frame has no ``type_col`` the type check is
    skipped and any host+timestamp row participates. Non-participants
    never enter the tracker: they don't break sessions, don't consume
    ordinals — and, in the plan, never enter the window shuffle (the
    bystander branch is a narrow map over the scan).

    ``scope_col`` reproduces the per-output-file id reset (pass the
    per-site sink's partition column); ``None`` = one global scope.
    With ``opaque=False`` the readable ``host/ordinal`` pair is kept —
    deterministic, used by the oracle tests (the reference's ids are
    opaque serial numbers whose exact values are an implementation
    detail; ordinals preserve the observable grouping).
    """
    pred = F.col(host_col).isNotNull() & F.col(ts_col).isNotNull()
    if type_col and type_col in df.columns:
        pred = pred & (F.col(type_col) == F.lit("http_access"))
    pred = F.coalesce(pred, F.lit(False))
    participants = df.filter(pred)
    bystanders = df.filter(~pred).withColumn(
        "visitor_id", F.lit(None).cast("string")
    )

    parts = ([scope_col] if scope_col else []) + [host_col]
    w = Window.partitionBy(*parts).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    # µs precision — pond timestamps are µs-native (src/Protocol.hxx:44-47)
    ts_us = F.unix_micros(F.col(ts_col))
    gap = ts_us - F.lag(ts_us).over(w)
    is_break = F.when(gap.isNull() | (gap > timeout_s * 1_000_000), 1).otherwise(0)
    out = participants.withColumn(
        "_session_ordinal",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    vid_parts = ([F.col(scope_col)] if scope_col else []) + [
        F.col(host_col),
        F.col("_session_ordinal"),
    ]
    if opaque:
        out = out.withColumn(
            "visitor_id", F.sha2(F.concat_ws("\x1f", *vid_parts), 256).substr(1, 16)
        )
    else:
        out = out.withColumn("visitor_id", F.concat_ws("/", *vid_parts))
    return out.drop("_session_ordinal").unionByName(bystanders)
