"""Bloom-filter approximate membership — the shuffle-saving front end
for incremental dedup and blocklist filtering at corpus scale.

The 100 TB pattern: ``DigestCatalog.filter_new`` (dedup/exact.py) is an
anti-join that shuffles every batch digest against the full catalog.
When the catalog holds billions of digests, most batch rows are NEW —
they pay the shuffle only to find no match. A Bloom filter built once
over the catalog keys answers "definitely new" map-side: only the
(small) might-contain remainder enters the exact anti-join. No false
negatives by construction, so prefilter + exact join ≡ plain exact
join (asserted in tests); false positives only cost a little extra
exact-join traffic.

Representation: the bit array lives as a DataFrame of
``(word: long, bits: long)`` rows — 32 bits per word so the shift
arithmetic stays inside non-negative int64 in every engine (DuckDB's
``<<`` and Spark's ``shiftleft`` agree exactly on this range). At the
classic 10 bits/key the table is ~0.04% the size of the key set. For
probing, the words collapse into ONE dense array row (gap-filled
zeros, O(#words) via a sorted scatter — see ``_dense_bitmap``) that is
broadcast once; the membership test is then pure O(1)-indexed
expressions behind a single 1-row BroadcastNestedLoopJoin — zero
probe-side exchanges (plan-asserted in tests/test_scale_ops.py). The
pre-r11 shape was ``k`` chained BroadcastHashJoins: correct and
exchange-free too, but it planned k broadcast builds of the same
bitmap (no exchange reuse across the differently-aliased sides) and
measured ~1.2s of serial broadcast latency per query at k=5.

Hashing is the repo's portable affine family (same constants as
operators/packing.reproducible_shuffle / operators/sketches) over a
caller-supplied **long** key — pair it with functions.text.fingerprint
for text content so DuckDB oracle twins replay membership bit-for-bit.
Positions use Kirsch–Mitzenmacher double hashing
(``pos_i = h1 + i*h2 mod m``), the standard two-hash construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom", "mark_membership", "bloom_prefilter_new"]

#: affine-hash constants — the cross-engine-portable family used
#: across the repo (packing.py:107, sketches.py BK_*)
BF_P = 1_000_000_007
BF_A1, BF_C1 = 48_271, 2_654_435_761
BF_A2, BF_C2 = 69_621, 3_571_428_571
WORD_BITS = 32  # 32 bits/word keeps 1<<bit strictly positive in int64


def _h1(key: Column) -> Column:
    return F.pmod(key * F.lit(BF_A1) + F.lit(BF_C1), F.lit(BF_P))


def _h2(key: Column) -> Column:
    # *2+1 keeps the stride odd (never 0), so the k probe positions
    # are distinct modulo any power-of-two m
    return F.pmod(key * F.lit(BF_A2) + F.lit(BF_C2), F.lit(BF_P)) * 2 + 1


def _pos(key: Column, i: int, m_bits: int) -> Column:
    # h1 < 1e9+7, h2 < 2e9+15, i < k (small): h1 + i*h2 stays far
    # inside int64 for any practical k
    return F.pmod(_h1(key) + F.lit(i) * _h2(key), F.lit(m_bits))


def _mask(bit: Column) -> Column:
    # shiftleft() takes only a literal shift amount — index a 32-entry
    # literal mask array by the bit column instead (codegen-friendly)
    return F.element_at(
        F.array(*[F.lit(1 << b).cast("long") for b in range(WORD_BITS)]),
        bit.cast("int") + 1,
    )


def build_bloom(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """Build the ``(word, bits)`` bitmap over a long-typed key column.

    One narrow shuffle on word index (≤ m_bits/32 groups — tiny by
    design); NULL keys are skipped (a NULL key is never "seen").
    Deterministic: the bitmap is a pure function of the key set."""
    key = F.col(key_col).cast("long")
    pos = (
        keys.filter(key.isNotNull())
        .select(
            F.explode(
                F.array(*[_pos(key, i, m_bits) for i in range(k)])
            ).alias("_pos")
        )
    )
    return (
        pos.groupBy((F.col("_pos") / WORD_BITS).cast("long").alias("word"))
        .agg(
            F.bit_or(_mask(F.pmod(F.col("_pos"), F.lit(WORD_BITS)))).alias(
                "bits"
            )
        )
    )


def _dense_bitmap(bloom: DataFrame, n_words: int) -> DataFrame:
    """Collapse the ``(word, bits)`` rows into ONE row holding the
    dense ``array<long>`` bitmap (absent words = 0), for a single
    broadcast + O(1)-indexed probes.

    The scatter is LINEAR in n_words: entries are sorted by word, each
    entry contributes its gap of zero-words (``array_repeat``) plus its
    own bits, and ``flatten`` concatenates — the obvious alternative
    (``transform(sequence(0, n_words-1), w -> map[w])``) is a linear
    MAP lookup per position, O(n_words * #entries) total, measured 80 s
    at m_bits = 2^20 where this shape is sub-second."""
    ent = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("word").cast("long").alias("w"), F.col("bits").alias("b")
            )
        )
    )
    agg = bloom.agg(ent.alias("_e"))
    e = F.col("_e")
    zero = F.lit(0).cast("long")
    # element_at(e, i) is the PREVIOUS entry: lambda index i is
    # 0-based, element_at is 1-based, so position i = 0-based i-1
    body = F.flatten(
        F.transform(
            e,
            lambda x, i: F.concat(
                F.array_repeat(
                    zero,
                    (
                        x["w"]
                        - F.when(i == 0, F.lit(0)).otherwise(
                            F.element_at(e, i)["w"] + 1
                        )
                    ).cast("int"),
                ),
                F.array(x["b"]),
            ),
        )
    )
    tail = F.array_repeat(
        zero,
        (F.lit(n_words) - (F.element_at(e, F.size(e))["w"] + 1)).cast("int"),
    )
    full = F.when(
        F.size(e) == 0, F.array_repeat(zero, F.lit(n_words))
    ).otherwise(F.concat(body, tail))
    return agg.select(full.alias("_bf_arr"))


def mark_membership(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append ``out_col``: True iff every one of the key's ``k`` bloom
    bits is set (the standard no-false-negative test).

    Plan shape (r11): the dense bitmap row is broadcast ONCE through a
    1-row BroadcastNestedLoopJoin (the documented scalar-cross pattern,
    PLANS.md) and the k probes are pure O(1) ``element_at`` index
    expressions — no exchange, no groupBy, one broadcast of m_bits/4
    bytes. Replaces k chained BroadcastHashJoins that planned k
    broadcast builds of the same bitmap (~1.2 s serial broadcast
    latency at k=5, measured sf0.1)."""
    key = F.col(key_col).cast("long")
    out = df.crossJoin(F.broadcast(_dense_bitmap(bloom, m_bits // WORD_BITS)))
    cond: Column = key.isNotNull()
    for i in range(k):
        pos = _pos(key, i, m_bits)
        word = (pos / WORD_BITS).cast("int")
        mask = _mask(F.pmod(pos, F.lit(WORD_BITS)))
        cond = cond & (
            F.element_at(F.col("_bf_arr"), word + 1).bitwiseAND(mask) != 0
        )
    return out.withColumn(out_col, cond).drop("_bf_arr")


def bloom_prefilter_new(
    batch: DataFrame,
    catalog_keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Rows of ``batch`` whose key is NOT in ``catalog_keys`` — the
    Bloom-accelerated equivalent of a plain ``left_anti`` join (result
    is identical; asserted in tests).

    Definite-new rows (any bloom bit clear) pass through map-side with
    **zero** shuffle; only might-contain rows — true members plus the
    ~0.1%-at-10-bits/key false positives — enter the exact anti-join.
    At 100 TB this turns "shuffle the whole batch against a billion-row
    catalog" into "shuffle the sliver the filter couldn't clear"."""
    bloom = build_bloom(catalog_keys, key_col, m_bits, k)
    marked = mark_membership(batch, bloom, key_col, m_bits, k, "_bf_hit")
    definite_new = marked.filter(~F.col("_bf_hit")).drop("_bf_hit")
    suspect = marked.filter(F.col("_bf_hit")).drop("_bf_hit")
    confirmed_new = suspect.join(
        catalog_keys.select(F.col(key_col).cast("long").alias(key_col)),
        key_col,
        "left_anti",
    )
    return definite_new.unionByName(confirmed_new)
