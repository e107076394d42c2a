"""SimHash (Charikar) fingerprints and near-duplicate pairs.

simhash64: 64-bit fingerprint — bit b of the hash is the sign of
``Σ_tokens (bit_b(h(token)) ? +1 : -1)``. Near-dups are pairs within a
small Hamming distance.

Candidate generation uses the pigeonhole principle: split the 64-bit
fingerprint into ``d+1`` chunks — any pair with Hamming distance <= d
agrees on at least one full chunk — and join on (chunk_idx, chunk
value), then verify with ``bit_count(xor)``.

Scale notes: per-doc work is a single map-side array fold (no
shuffle, no row explosion), fanned out across cores for small inputs;
the pair join shuffles on 16-bit chunk values × chunk idx — narrow
keys, high fan-out only for pathological boilerplate (AQE skew-split
applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _word_ngrams, _words
from pond_spark.util import fan_out


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, simhash) — 64-bit fingerprint as a signed long over word
    n-gram features (n=1: single tokens).

    Formulation: per-row array folds over the feature-hash array
    instead of explode + groupBy(64 sums) — no shuffle, no row
    explosion, strictly map-side at cluster scale. The 64 bit-counters
    are packed 4-per-long into 16-bit lanes, so 16 folds (16 array
    passes) cover all 64 bits; the naive one-fold-per-bit layout makes
    64 passes over the array and measured 20x slower at sf0.1. Lane
    counters saturate at 65535 distinct grams per doc — far above any
    real document (a lane overflow would need a 64k-distinct-shingle
    doc; guard is the ``array_distinct`` cardinality itself)."""
    # stage the split once — an inline split inside the gram lambda is
    # re-derived per position (HOF-vs-CSE trap, PERF_NOTES.md)
    carry = [F.col(c) for c in carry_cols]
    staged = fan_out(df).select(
        F.col(id_col),
        *carry,
        _words(F.col(text_col)).alias("_t"),
    )
    words = F.col("_t")
    # shared tokenization/gramming (functions.text) — see ngram.py
    grams = words if n == 1 else _word_ngrams(words, n)
    hashes = F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))
    return simhash64_from_hashes(
        staged.select(F.col(id_col), *carry, hashes.alias("_h")),
        hashes_col="_h",
        id_col=id_col,
        carry_cols=carry_cols,
    )


def simhash64_from_hashes(
    df: DataFrame,
    hashes_col: str = "_grams",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, simhash) from a PRECOMPUTED distinct feature-hash array —
    the fold core of :func:`simhash64`, exposed so a caller that
    already pays the tokenize+gram+hash pass for an exact-Jaccard
    branch (``ngram.gram_hashes``) can feed the SAME persisted frame
    here instead of re-scanning the corpus (guide §1.2).

    Bit-identical to :func:`simhash64` at the same n for EVERY doc:
    both derive the feature set via functions.text ``_words`` /
    ``_word_ngrams`` (same empty/short-doc rules), the per-bit
    counters are sums over the set (element order is irrelevant, so
    ``gram_hashes``'s ``array_sort`` is invisible), and NULL arrays
    propagate to NULL fingerprints on both paths."""
    carry = [F.col(c) for c in carry_cols]
    base = df.select(
        F.col(id_col),
        *carry,
        F.col(hashes_col).alias("_h"),
        F.size(hashes_col).alias("_n"),
    )

    def lanes(f: int):
        # one long = 4 x 16-bit bit-counters for bits f, f+16, f+32,
        # f+48 — adding the four (0|1) contributions in disjoint lanes
        # can't carry across lane boundaries below 65536 grams/doc
        return F.aggregate(
            F.col("_h"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.shiftright(h, f).bitwiseAND(F.lit(1)).cast("long")
            + F.shiftleft(
                F.shiftright(h, f + 16).bitwiseAND(F.lit(1)).cast("long"), 16
            )
            + F.shiftleft(
                F.shiftright(h, f + 32).bitwiseAND(F.lit(1)).cast("long"), 32
            )
            + F.shiftleft(
                F.shiftright(h, f + 48).bitwiseAND(F.lit(1)).cast("long"), 48
            ),
        )

    step = base.select(
        F.col(id_col),
        *carry,
        F.col("_n"),
        F.array(*[lanes(f) for f in range(16)]).alias("_lanes"),
    )
    fp = F.lit(0).cast("long")
    for b in range(64):
        f, lane = b % 16, b // 16
        ones = F.shiftright(
            F.element_at(F.col("_lanes"), f + 1), 16 * lane
        ).bitwiseAND(F.lit(0xFFFF))
        # bit b set when the +1/-1 bit-sum is positive: 2*ones > n.
        # shiftleft on a long handles bit 63 (wraps to the sign bit);
        # a python-side 1 << 63 literal would overflow signed int64
        bit = F.shiftleft(F.lit(1).cast("long"), b)
        fp = fp.bitwiseOR(
            F.when(2 * ones > F.col("_n"), bit).otherwise(F.lit(0).cast("long"))
        )
    return step.select(F.col(id_col), *carry, fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n: int = 1,
    block_col: str | None = None,
    max_bucket_size: int | None = None,
    hashes_df: DataFrame | None = None,
) -> DataFrame:
    """Pairs ``(id_a, id_b, hamming)`` with Hamming distance <= d.

    ``block_col`` joins chunks only within a block (e.g. language) —
    near-dups never cross languages, and at high ``max_hamming`` the
    chunk-value space shrinks to a few bits, so blocking divides the
    candidate volume by the block count. ``max_bucket_size`` drops
    pathological chunk buckets (boilerplate skew guard — see
    minhash.minhash_lsh_pairs).

    ``hashes_df``: optional PRECOMPUTED ``(id [, block], _grams)``
    distinct-hash frame (``ngram.gram_hashes`` with the block carried,
    ideally already persisted by the caller) — skips this operator's
    own tokenize+gram+hash pass; fingerprints are bit-identical
    (:func:`simhash64_from_hashes`). ``text_col``/``n`` are ignored
    when it is given."""
    carry = (block_col,) if block_col else ()
    # both join sides derive from fps — persist so the explode +
    # 64-bit-sum aggregation runs once, not per side. Lifecycle: the
    # pin lives until the session drops it; loop drivers clearCache
    # between queries (bench.py does), same as the minhash/LSH pins.
    fps = (
        simhash64_from_hashes(
            hashes_df, hashes_col="_grams", id_col=id_col, carry_cols=carry
        )
        if hashes_df is not None
        else simhash64(df, text_col, id_col, n, carry_cols=carry)
    ).persist()
    return hamming_near_pairs(
        fps,
        sig_col="simhash",
        id_col=id_col,
        max_hamming=max_hamming,
        block_col=block_col,
        max_bucket_size=max_bucket_size,
    )


def hamming_near_pairs(
    fps: DataFrame,
    sig_col: str = "simhash",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_col: str | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Pigeonhole chunk join over PRECOMPUTED 64-bit signatures:
    ``(id_a, id_b, hamming)`` with Hamming <= d. Shared by the text
    SimHash path and any other 64-bit fingerprint (e.g. perceptual
    image dHash, multimodal/binaryops.image_dhash_batch). Chunks not
    covering the top ``64 % (d+1)`` bits only LOOSEN the join (pairs
    differing solely there share every chunk), so recall stays total;
    the exact Hamming verify filters after."""
    chunks = max_hamming + 1
    width = 64 // chunks
    # width 64 (max_hamming=0, exact matching): the all-ones mask does
    # not fit a SIGNED int64 literal as (1<<64)-1 — it IS -1 in two's
    # complement, and AND with -1 is the identity the mask intends
    chunk_mask = -1 if width == 64 else (1 << width) - 1
    carry = (block_col,) if block_col else ()

    chunked = fps.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col(sig_col), i * width)
                        .bitwiseAND(F.lit(chunk_mask))
                        .alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("_c"),
    ).select(id_col, *carry, "_sig", "_c.ci", "_c.cv")

    keys = [*carry, "ci", "cv"]
    if max_bucket_size is not None:
        hot = (
            chunked.groupBy(*keys)
            .count()
            .filter(F.col("count") > max_bucket_size)
            .select(*keys)
        )
        chunked = chunked.join(F.broadcast(hot), keys, "left_anti")

    left = chunked.select(
        F.col(id_col).alias("id_a"), F.col("_sig").alias("_fa"), *keys
    )
    right = chunked.select(
        F.col(id_col).alias("id_b"), F.col("_sig").alias("_fb"), *keys
    )
    return (
        left.join(right, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_fa", "_fb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
