"""Token-budget shard packing: assign documents to contiguous training
shards so each shard holds ~``budget`` tokens in a stable global order.

``shard = floor(exclusive_prefix_sum(n_tokens) / budget)`` over the
order column — the standard "pack documents into fixed-token shards"
step before tokenized-dataset writing.

Scale shape: a naive ``Window.orderBy(id)`` prefix sum collapses the
whole table into ONE partition (Spark plans an un-partitioned window
as a single-task sort) — a scale-killer at 100 TB. This implementation
is the classic two-level distributed prefix sum instead:

1. rows bucket by a monotone coarse key (``id // bucket_width``) —
   per-bucket exclusive cumsums run in parallel, one window per
   bucket partition;
2. per-bucket totals (a tiny groupBy) get their own exclusive prefix
   sum — the only global window, over n_buckets rows, not n rows;
3. bucket offsets broadcast-join back and add.

Equivalent to the global window by associativity of +; every stage is
built-in expressions; the DuckDB oracle uses the naive global window,
which is exact on a single node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_shards(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket_width: int = 100_000,
    out_col: str = "shard",
) -> DataFrame:
    """Append ``shard`` (0-based) and ``token_offset`` (the exclusive
    prefix sum: tokens preceding this doc in ``order_col`` order).
    ``order_col`` must be integral and unique; ``bucket_width`` trades
    bucket count (global stage size) against per-bucket parallelism."""
    b = (F.col(order_col) / F.lit(bucket_width)).cast("long").alias("_b")
    rows = df.withColumn("_b", b)

    w_in = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = rows.withColumn(
        "_local", F.coalesce(F.sum(tokens_col).over(w_in), F.lit(0)).cast("long")
    )

    totals = rows.groupBy("_b").agg(F.sum(tokens_col).cast("long").alias("_tot"))
    w_b = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)).cast("long").alias("_off")
    )

    return (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn("token_offset", F.col("_off") + F.col("_local"))
        .withColumn(
            out_col, F.floor(F.col("token_offset") / F.lit(budget)).cast("long")
        )
        .drop("_b", "_local", "_off")
    )


def pack_shards_sql(
    budget: int,
    table_expr: str,
    tokens_expr: str = "n_tokens",
    order_expr: str = "doc_id",
    cols: str = "*",
) -> str:
    """DuckDB twin: the naive exclusive-prefix-sum window (exact on a
    single node)."""
    prefix = (
        f"CAST(coalesce(sum({tokens_expr}) OVER (ORDER BY {order_expr} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    )
    return f"""
SELECT {cols}, {prefix} AS token_offset,
       CAST(floor({prefix} * 1.0 / {budget}) AS BIGINT) AS shard
FROM {table_expr}
"""


#: Lehmer multiplier + Knuth constant for the portable permutation key
SHUFFLE_A = 48_271
SHUFFLE_C = 2_654_435_761
SHUFFLE_MOD = 1_000_000_007


def reproducible_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Seed-stable corpus permutation + shard split — the "global
    shuffle" every training-data loader needs, without a global sort.

    ``key = (id*48271 + seed*2654435761) mod 1e9+7`` is an affine hash
    any engine computes identically (the oracle-portability discipline
    of functions/text.fingerprint); ``shard = key mod n_shards``
    balances by hashing (no rank needed, fully parallel), and ``pos``
    is the row's position within its shard by ``(key, id)`` — so
    reading shards 0..n-1 each in pos order IS the seeded permutation
    of the corpus.

    Scale shape: ONE hash exchange on ``shard`` + a per-shard local
    sort (the window is partitioned — n_shards parallel sorts, never
    the single-task global window). Changing the seed re-permutes
    every epoch; changing n_shards only re-buckets.
    """
    key = F.pmod(
        F.col(id_col) * F.lit(SHUFFLE_A) + F.lit(seed) * F.lit(SHUFFLE_C),
        F.lit(SHUFFLE_MOD),
    ).alias("shuffle_key")
    rows = df.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards))
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return rows.withColumn(
        "pos", (F.row_number().over(w) - F.lit(1)).cast("long")
    )


def reproducible_shuffle_sql(
    n_shards: int,
    table_expr: str,
    id_expr: str = "doc_id",
    seed: int = 1,
    cols: str = "*",
) -> str:
    """DuckDB twin — identical affine key, shard and in-shard rank."""
    key = f"(({id_expr}) * {SHUFFLE_A} + {seed} * {SHUFFLE_C}) % {SHUFFLE_MOD}"
    return f"""
SELECT {cols}, CAST({key} AS BIGINT) AS shuffle_key,
       CAST({key} % {n_shards} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY {key} % {n_shards}
                               ORDER BY {key}, {id_expr}) - 1 AS BIGINT) AS pos
FROM {table_expr}
"""
