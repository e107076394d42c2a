"""Sinks (S5-S10): text, JSONL, gzip, per-site partitioned files, raw
round-trip.

Mappings (SURVEY.md §2.1): the reference's buffered stdout writer and
per-site file trees become DataFrame writers; gzip (S9) is the
``compression`` option (concatenation-safe, like the reference's
Z_SYNC_FLUSH files); the per-site sink (S10) is ``partitionBy`` on the
sanitized site with optional aa/bb sharding as extra partition columns
(/root/reference/src/client/PerSitePath.cxx:16-101); raw (S7) preserves
the full row for lossless re-emission, which in this engine means
writing the schema-complete Parquet row back out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.format import OneLineOptions, one_line, to_json_projection
from pond_spark.functions.sanitize import sanitize_site
from pond_spark.operators.sessionize import track_visitors

#: µs-precision JSON timestamp format: Spark's DEFAULT to_json
#: timestampFormat truncates to MILLISECONDS (the formats.py writer
#: pins this for the same reason), silently losing the engine's
#: µs-native precision and breaking the packet-socket round-trip —
#: re-ingested rows differed in the sub-ms digits (r6 review finding).
#: The ISO form round-trips exactly through from_json's default parse.
_JSON_TS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_text(
    df: DataFrame,
    path: str,
    opts: OneLineOptions = OneLineOptions(),
    gzip: bool = False,
) -> None:
    """S5 one-line text sink (+S9 gzip)."""
    w = df.select(one_line(opts).alias("value")).write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.text(path)


def write_jsonl(df: DataFrame, path: str, gzip: bool = False) -> None:
    """S6 JSONL sink — null fields dropped, matching FormatJson's
    absent-if-unset keys (src/client/FormatJson.cxx:24-88)."""
    w = to_json_projection(df).write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path, ignoreNullFields=True, timestampFormat=_JSON_TS)


def write_per_site(
    df: DataFrame,
    path: str,
    fmt: str = "text",
    shard: bool = False,
    visitors: bool = False,
    opts: OneLineOptions | None = None,
    gzip: bool = False,
    filename: str | None = None,
) -> None:
    """S10 per-site partitioned sink.

    - site names sanitized (P6); unsanitizable sites skipped
      (ResultWriter.cxx:77-110)
    - ``shard=True`` adds the aa/bb nested tree as an extra partition
      column (PerSitePath nested mode)
    - ``visitors=True`` runs sessionization scoped per site file —
      the reference resets visitor ids per output file
      (ResultWriter.cxx:358-362)
    - show_site auto-off: records route to their own site's file
      (ResultWriter.cxx:152-163)
    - ``filename`` names each site's output file (the reference
      client's --per-site-file, Main.cxx:229-232): the frame is
      repartitioned on the site dir so each directory holds exactly
      one data file, which is renamed after the write — through the
      path's filesystem, so schemed stores rename for real
      (round-9 #1).
    """
    out = df.withColumn("_site_dir", sanitize_site(F.col("site"))).filter(
        F.col("_site_dir").isNotNull()
    )
    if visitors:
        # the reference APPENDS an opaque visitor-id column to the
        # output (doc/index.rst:219-224); ids reset per output file
        # via the _site_dir scope (ResultWriter.cxx:358-362)
        out = track_visitors(out, scope_col="_site_dir")
    part_cols = ["_site_dir"]
    if shard:
        out = out.withColumn("_shard", F.substring("_site_dir", 1, 2))
        part_cols = ["_shard", "_site_dir"]

    opts = opts or OneLineOptions(show_site=False)
    if fmt == "text":
        line = one_line(opts)
        if visitors:
            line = F.concat_ws(
                " ", line, F.coalesce(F.col("visitor_id"), F.lit("-"))
            )
        proj = out.select(line.alias("value"), *part_cols)
        if filename is not None:
            proj = proj.repartition(*part_cols)
        w = proj.write.mode("overwrite")
        if gzip:
            w = w.option("compression", "gzip")
        w.partitionBy(*part_cols).text(path)
    elif fmt == "json":
        # the SAME JSON field set as the S6 stdout sink (FormatJson
        # parity): per-site JSONL must not leak internal columns like
        # `id` that to_json_projection excludes (r4 review finding)
        from pond_spark.functions.format import JSON_FIELDS

        keep = [c for c in JSON_FIELDS if c in out.columns]
        if visitors and "visitor_id" in out.columns:
            keep = keep + ["visitor_id"]
        proj = out.select(*keep, *part_cols)
        if filename is not None:
            proj = proj.repartition(*part_cols)
        w = proj.write.mode("overwrite")
        if gzip:
            w = w.option("compression", "gzip")
        w.partitionBy(*part_cols).json(
            path, ignoreNullFields=True, timestampFormat=_JSON_TS
        )
    else:
        raise ValueError(f"unknown per-site format: {fmt}")
    if filename is not None:
        _rename_part_files(
            df.sparkSession, path, filename + (".gz" if gzip else "")
        )


def _rename_part_files(spark, root: str, filename: str) -> None:
    """Give each site directory its single data file the requested
    name (see write_per_site ``filename``). Listing/renames go through
    the path's filesystem (catalog._fs_for): the partition tree is at
    most two levels (``_site_dir=…`` or ``_shard=…/_site_dir=…``), so
    two glob depths cover every leaf."""
    import os as _os

    from pond_spark.catalog import _fs_for

    fs = _fs_for(spark, root)
    safe_root = fs.glob_escape(root)
    parts_by_dir: dict[str, list[str]] = {}
    for pat in ("*/part-*", "*/*/part-*"):
        for p in fs.glob(_os.path.join(safe_root, pat)):
            d, name = p.rstrip("/").rsplit("/", 1)
            parts_by_dir.setdefault(d, []).append(name)
    for d, parts in sorted(parts_by_dir.items()):
        if len(parts) > 1:  # defensive: repartition should prevent this
            raise RuntimeError(
                f"per-site dir {d} has {len(parts)} data files; cannot "
                f"apply --per-site-file name {filename!r}"
            )
        fs.rename(d + "/" + parts[0], d + "/" + filename)
        for crc in fs.glob(fs.glob_escape(d) + "/.part-*.crc"):
            fs.remove(crc)


def write_raw(df: DataFrame, path: str) -> None:
    """S7 raw sink: lossless row round-trip (re-injectable via
    LogStore.append / S2)."""
    df.write.mode("overwrite").parquet(path)


def write_packet_socket(
    df: DataFrame,
    address: str,
    seqpacket: bool = False,
    max_datagram_bytes: int | None = None,
    oversize: str = "error",
) -> None:
    """S8 packet-socket sink (ResultWriter.cxx:63-75,112-120,368-371):
    when the reference client's stdout is a datagram/seqpacket socket
    it emits one raw datagram per record instead of a byte stream —
    the reference handles BOTH packet-socket types (SOCK_DGRAM and
    SOCK_SEQPACKET); pass ``seqpacket=True`` for the latter.
    Engine mapping: re-serialize each row to the engine's wire format
    — the JSON datagram encoding the S1 receiver parses, null fields
    absent — and send ONE datagram per record to a local AF_UNIX
    socket, one connection per partition (foreachPartition; no driver
    collection — each executor streams its own partitions). Records
    round-trip losslessly through sources.ingest.ingest_batch.

    A record larger than the socket buffer would fail the whole task
    with EMSGSIZE deep in a Spark stage; ``max_datagram_bytes``
    (default: one byte under the receiver's MAX_DATAGRAM_SIZE
    truncation guard, so every datagram sent is one the re-ingest
    path accepts; raise it explicitly — up to the ~208 KiB Linux
    AF_UNIX bound — when feeding a non-pond receiver) bounds the
    encoded size up front. ``oversize`` chooses
    the policy: ``"error"`` raises with the row's size (run the
    records through a truncation projection first if dropping payload
    is acceptable), ``"skip"`` drops oversized records (counted and
    reported per partition via a log line, matching the reference's
    best-effort datagram semantics)."""
    if oversize not in ("error", "skip"):
        raise ValueError(f"oversize must be error|skip, got {oversize!r}")
    if max_datagram_bytes is None:
        # default to the RECEIVER's truncation guard, not the kernel's
        # ~208 KiB AF_UNIX bound: a 5 KB record would pass a 200 KB cap
        # and then be dropped as _malformed by parse_datagrams'
        # MAX_DATAGRAM_SIZE check — silently violating the documented
        # lossless round-trip (r6 review finding). Callers feeding a
        # non-pond receiver may raise the cap explicitly.
        from pond_spark.sources.ingest import MAX_DATAGRAM_SIZE

        max_datagram_bytes = MAX_DATAGRAM_SIZE - 1
    lines = df.select(
        F.to_json(
            F.struct(*df.columns),
            {"ignoreNullFields": "true", "timestampFormat": _JSON_TS},
        ).alias("dgram")
    )

    def _send(rows) -> None:
        import socket

        kind = socket.SOCK_SEQPACKET if seqpacket else socket.SOCK_DGRAM
        s = socket.socket(socket.AF_UNIX, kind)
        skipped = 0
        try:
            s.connect(address)
            for r in rows:
                payload = r.dgram.encode("utf-8")
                if len(payload) > max_datagram_bytes:
                    if oversize == "error":
                        raise ValueError(
                            f"write_packet_socket: record of {len(payload)} B "
                            f"exceeds max_datagram_bytes={max_datagram_bytes} "
                            "— truncate upstream or raise the cap"
                        )
                    skipped += 1
                    continue
                # send(), not sendall(): one datagram per record — a
                # packet socket delivers the payload atomically or not
                # at all, and sendall could split a partial write
                s.send(payload)
        finally:
            s.close()
            if skipped:
                print(
                    f"write_packet_socket: skipped {skipped} oversized "
                    f"record(s) > {max_datagram_bytes} B"
                )

    lines.foreachPartition(_send)
