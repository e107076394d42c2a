"""Z-order (Morton) clustering for multi-dimensional scan pruning.

The LogStore's default layout is site-major within date partitions —
ideal for ``site=`` scans, worse for pure time scans inside a day.
Z-ordering interleaves the bits of several dimension ranks into one
sort key, so files/row-groups cover small *rectangles* of the
(site, time) space instead of thin stripes: min/max footer stats then
prune effectively for predicates on ANY prefix-independent subset of
the dimensions (the trick behind Databricks Delta's OPTIMIZE ZORDER
and ClickHouse's hilbertEncode, in plain Spark expressions).

Everything is a pure JVM expression (shifts/masks folded by codegen):
rank derivation, bit interleave, and the final
``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` — one range
shuffle, exactly what the plain sort would cost.

At 100 TB: z-cluster *within* each date partition (compose with the
p_date directory pruning); 16 bits/dim bounds the key to 32-64 bits
for 2-4 dims, and rank quantization only affects pruning granularity,
never correctness — the exact predicate still filters row values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rank16", "rank16_time_of_day", "zorder_key", "cluster_by_zorder"]


def rank16(col: Column, dtype: str) -> Column:
    """A 16-bit unsigned rank for a column of Spark type ``dtype``.

    Order-preserving (mod 2^16) for numeric types and timestamps
    (minutes-since-epoch — adjacent times share high bits, so time
    ranges cluster); hash-based for strings (order-free but
    equality-clustered — what ``site=`` pruning needs). NULL ranks 0.
    """
    if dtype.startswith("timestamp"):
        val = (col.cast("timestamp").cast("long") / 60).cast("long")
    elif dtype == "date":
        # DATE has no direct numeric cast in Spark (DATATYPE_MISMATCH);
        # days-since-epoch is the order-preserving integer form
        val = F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    elif dtype in ("tinyint", "smallint", "int", "bigint") or dtype.startswith(
        ("decimal", "double", "float")
    ):
        val = col.cast("long")
    else:
        val = F.xxhash64(col.cast("string"))
    return F.coalesce(F.pmod(val, F.lit(65536)).cast("int"), F.lit(0))


def rank16_time_of_day(col: Column) -> Column:
    """Second-of-day scaled to the FULL 16-bit range — the rank for
    timestamps clustered WITHIN a date partition, where raw epoch
    seconds only vary in their low bits and would hand the interleave
    to the other dimension's high bits.

    Integer second-of-day (0..86399) over the 86399 max keeps the rank
    ≤ 65535 exactly; a fractional-minute numerator over 1439 overflows
    to 65579 at 23:59:02+, wrapping end-of-day rows to ~0 in the
    16-bit interleave and clustering them with midnight. NULL ranks 0.
    """
    sod = F.pmod(col.cast("timestamp").cast("long"), F.lit(86400))
    return F.coalesce(
        F.floor(sod * 65535 / F.lit(86399)).cast("int"), F.lit(0)
    )


def zorder_key(ranks: Sequence[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each rank into one long.

    Bit ``b`` of rank ``i`` lands at position ``b * d + i`` — the
    classic Morton layout; ``d * bits`` must stay ≤ 63."""
    d = len(ranks)
    if d * bits > 63:
        raise ValueError("zorder key would exceed 63 bits")
    key: Column = F.lit(0).cast("long")
    for i, r in enumerate(ranks):
        rl = r.cast("long")
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(rl, b).bitwiseAND(F.lit(1)), b * d + i
                )
            )
    return key


def cluster_by_zorder(
    df: DataFrame,
    dims: Sequence[str],
    bits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the Morton key of ``dims``.

    Ordered dims (numeric/timestamp) are min/max-normalized to the
    FULL ``bits`` range first — without this, a dimension whose actual
    span uses fewer bits (a single day = 11 bits of minutes) loses the
    interleave to the other dimension's high bits and the curve
    degenerates to lexicographic order. The normalization bounds come
    from one aggregate over the batch being written (a write-time job
    already pays a full pass) and join in via a broadcast cross join.

    One range shuffle — the same cost as the plain layout sort. Write
    the result with ``.write.parquet`` (or feed LogStore.append):
    parquet min/max footer stats per row-group then serve predicates
    on any of the dims.

    ``bits`` auto-shrinks so ``len(dims) * bits <= 63`` (3 dims → 16
    bits hold; 4 dims → 15 bits each): the module header's "2-4 dims"
    promise must not trip zorder_key's 63-bit guard at the default."""
    dtypes = dict(df.dtypes)
    if dims and len(dims) * bits > 63:
        bits = 63 // len(dims)
    top = (1 << bits) - 1

    def is_ordered(c: str) -> bool:
        d = dtypes[c]
        return (
            d.startswith(("timestamp", "decimal", "double", "float"))
            or d in ("tinyint", "smallint", "int", "bigint", "date")
        )

    ordered = [c for c in dims if is_ordered(c)]

    def as_double(c: str) -> Column:
        # DATE (and only DATE) has no direct numeric cast in Spark —
        # go through days-since-epoch; timestamps through epoch seconds
        d = dtypes[c]
        if d.startswith("timestamp"):
            return F.col(c).cast("timestamp").cast("double")
        if d == "date":
            return F.datediff(
                F.col(c), F.lit("1970-01-01").cast("date")
            ).cast("double")
        return F.col(c).cast("double")

    out = df
    if ordered:
        bounds = df.agg(
            *[
                f(as_double(c)).alias(f"_{tag}_{c}")
                for c in ordered
                for tag, f in (("min", F.min), ("max", F.max))
            ]
        )
        out = out.crossJoin(F.broadcast(bounds))

    ranks: list[Column] = []
    for c in dims:
        if c in ordered:
            v = as_double(c)
            lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
            scaled = F.when(
                hi > lo,
                F.floor((v - lo) * F.lit(float(top)) / (hi - lo)).cast("int"),
            ).otherwise(F.lit(0))
            ranks.append(F.coalesce(scaled, F.lit(0)))
        else:
            ranks.append(rank16(F.col(c), dtypes[c]))
    key = zorder_key(ranks, bits)
    out = out.withColumn("_zkey", key).drop(
        *[f"_{tag}_{c}" for c in ordered for tag in ("min", "max")]
    )
    if partitions:
        out = out.repartitionByRange(partitions, "_zkey")
    else:
        out = out.repartitionByRange("_zkey")
    return out.sortWithinPartitions("_zkey").drop("_zkey")
