"""First-fit-decreasing sequence packing WITHOUT document splitting.

``pack_shards`` (operators/packing.py) is the concat-and-chunk packing
step: documents concatenate in a global order and split at every
``budget`` boundary — maximal density, but documents straddle sequence
boundaries and get truncated context. This module is the other packing
family used by training pipelines that care about truncation (best-fit
/ first-fit packing, e.g. Ding et al. 2024, "Fewer Truncations Improve
Language Modeling"): each training sequence of ``capacity`` tokens
holds only WHOLE documents, assigned first-fit over documents sorted
by descending token count (FFD — the classic 11/9·OPT+1 bin-packing
approximation).

Scale shape: global FFD is inherently sequential, so the corpus is
hash-bucketed (``bucket = id % n_buckets``) and FFD runs independently
per bucket inside ONE ``applyInPandas`` pass — a single exchange on
the bucket key, no other shuffle. Bucketing bounds the per-task
working set to ``corpus / n_buckets`` rows of (id, size) — two numeric
columns, NOT the text — and costs at most one partially-filled bin per
bucket versus global FFD (each bucket's last bins may be under-filled,
a bounded additive waste of ``n_buckets * (capacity-1)`` tokens in the
worst case). At 100 TB you raise ``n_buckets`` to cluster width; FFD
quality per bucket is unchanged because FFD's approximation bound is
instance-size-independent. The per-bucket loop is a numpy first-fit
scan (O(n_bucket * bins) with a vectorized inner probe); an interval
tree would make it O(n log n) but the constant only matters past ~1M
documents per bucket, i.e. after ``n_buckets`` should have been raised
anyway.

Documents larger than ``capacity`` get a singleton bin (first-fit
finds no bin, opens a new one that then never fits anything else);
truncation policy belongs to the caller.

Determinism: items are processed in (size DESC, id ASC) order and bins
scanned in creation order, so the assignment is a pure function of the
input — the DuckDB twin (``pack_sequences_sql``) replays the identical
fold as a recursive CTE carrying the per-bucket bin-fill list, which
is what makes this operator hash-oracle-able despite being iterative.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Assign every row to a (bucket, bin) training sequence of at most
    ``capacity`` tokens via per-bucket first-fit-decreasing. Returns
    ``(id_col, bucket, bin, n_tokens)`` — one row per input document;
    ``bin`` is bucket-local and 0-based in bin-creation order.

    ``id_col`` must be a non-negative integral key (it both buckets the
    corpus and breaks sort ties, so the output is deterministic)."""
    cap = int(capacity)
    out_schema = f"{id_col} long, bucket int, bin long, n_tokens long"

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        )
        sizes = pdf[tokens_col].to_numpy(dtype="int64")
        n = len(sizes)
        fills = np.zeros(n, dtype="int64")  # bin j's current fill
        bins = np.zeros(n, dtype="int64")  # item i's assigned bin
        n_bins = 0
        for i in range(n):
            sz = sizes[i]
            fits = np.nonzero(fills[:n_bins] + sz <= cap)[0]
            if fits.size:
                j = int(fits[0])
            else:
                j = n_bins
                n_bins += 1
            fills[j] += sz
            bins[i] = j
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(dtype="int64"),
                "bucket": pdf["bucket"].to_numpy(dtype="int32"),
                "bin": bins,
                "n_tokens": sizes,
            }
        )

    rows = (
        df.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
        )
        # a NULL size would poison the numpy fold mid-task; rows
        # without a measurable size cannot be packed at all
        .filter(F.col(id_col).isNotNull() & F.col(tokens_col).isNotNull())
        .withColumn("bucket", (F.col(id_col) % F.lit(n_buckets)).cast("int"))
    )
    return rows.groupBy("bucket").applyInPandas(_ffd, out_schema)


def pack_sequences_sql(
    capacity: int,
    token_count_expr: str,
    n_buckets: int = 16,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`pack_sequences` + the per-bin rollup the
    contract query publishes. The FFD fold is replayed exactly by a
    recursive CTE: the working row per bucket carries the bin-fill
    list; each step consumes the next (size DESC, id ASC) item, finds
    the first fitting bin with ``list_position`` over a fits-mask, and
    either bumps that fill or appends a new bin — the same creation-
    order first-fit scan as the numpy loop. ``token_count_expr`` is
    the engine-shared token counter over ``text_col`` (the caller
    passes ``functions.text.token_count_sql(text_col)`` so both
    engines count identically)."""
    B = int(n_buckets)
    cap = int(capacity)
    return f"""
WITH RECURSIVE ranked AS MATERIALIZED (
  SELECT CAST({id_col} % {B} AS INT) AS bucket,
         CAST({id_col} AS BIGINT) AS id,
         CAST({token_count_expr} AS BIGINT) AS sz,
         row_number() OVER (PARTITION BY {id_col} % {B}
                            ORDER BY CAST({token_count_expr} AS BIGINT) DESC,
                                     {id_col}) AS rn
  FROM {table} WHERE {text_col} IS NOT NULL
),
pack AS (
  SELECT bucket, CAST(0 AS BIGINT) AS rn,
         CAST([] AS BIGINT[]) AS fills,
         CAST([] AS STRUCT(id BIGINT, bin BIGINT, sz BIGINT)[]) AS asg
  FROM (SELECT DISTINCT bucket FROM ranked)
  UNION ALL
  SELECT p.bucket, p.rn + 1,
         CASE WHEN j.j = 0 THEN list_append(p.fills, i.sz)
              ELSE list_transform(range(1, len(p.fills) + 1),
                     k -> CASE WHEN k = j.j THEN p.fills[k] + i.sz
                          ELSE p.fills[k] END) END,
         list_append(p.asg, {{'id': i.id,
           'bin': CAST(CASE WHEN j.j = 0 THEN len(p.fills) + 1
                       ELSE j.j END - 1 AS BIGINT), 'sz': i.sz}})
  FROM pack p
  JOIN ranked i ON i.bucket = p.bucket AND i.rn = p.rn + 1
  CROSS JOIN LATERAL (SELECT coalesce(list_position(
        list_transform(p.fills, f -> f + i.sz <= {cap}), true), 0) AS j) AS j
),
final AS (
  SELECT bucket, asg,
         row_number() OVER (PARTITION BY bucket ORDER BY rn DESC) AS rr
  FROM pack
)
SELECT f.bucket AS bucket, a.bin AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(a.sz) AS BIGINT) AS fill_tokens,
       CAST({cap} - sum(a.sz) AS BIGINT) AS waste,
       CAST(min(a.id) AS BIGINT) AS first_doc
FROM final f, unnest(f.asg) AS t(a)
WHERE f.rr = 1
GROUP BY 1, 2
"""
