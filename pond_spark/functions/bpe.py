"""Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
tokenizer-training step of a pretraining-data pipeline, run where the
corpus lives instead of sampling it down to one machine.

Shape: the corpus is reduced ONCE to the (word, count) vocabulary
frame — the only corpus-wide shuffle. Every merge iteration then runs
on that vocabulary-sized frame: explode adjacent symbol pairs
(weighted by word count), one map-side-combined groupBy, take the
argmax pair (a bounded 1-row collect per iteration — the IVF-Lloyd
pattern), and rewrite each word's symbol array with a greedy
leftmost-nonoverlapping merge expressed as a JVM ``aggregate`` lambda
(no Python in the loop). ``localCheckpoint`` truncates lineage per
iteration so ``n_merges`` stays O(1) plan depth.

At 100 TB the vocabulary frame is millions of rows, not trillions —
iterating on it is exactly how productionized distributed BPE works;
the token stream itself is never re-scanned. Applying a trained
merge table to the corpus (``bpe_segment``) also runs on distinct
words, then broadcasts the word→pieces map back onto the token
stream.

Oracle note (hard row since round 6): the merge sequence is fully
deterministic (greedy leftmost application, argmax ties broken
lexicographically on (left, right)), so the DuckDB twin
``bpe_train_sql`` replays the identical n_merges iterations as
unrolled MATERIALIZED CTEs — the pagerank-oracle pattern. The greedy
leftmost-nonoverlapping merge is expressed as a plain string
``replace``: each symbol is wrapped in a chr(1) delimiter
(``\\x01 sym \\x01``), so the pattern ``\\x01 a \\x01\\x01 b \\x01``
can never self-overlap and left-to-right non-overlapping replacement
is EXACTLY the greedy merge rule (a merged symbol ``a||b`` is
strictly longer than ``a`` and so can never re-form the left side of
the same pattern within one pass). chr(1) cannot collide with corpus
symbols: words are whitespace-split from the driver's synthetic text
(no control characters — asserted in tests). An independent
pure-Python reference (tests/test_scale_ops.py) pins both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pond_spark.functions.text import _words

__all__ = ["bpe_train", "bpe_segment", "bpe_apply", "bpe_train_sql", "END"]

#: end-of-word sentinel symbol (Sennrich's </w>)
END = "</w>"


def _initial_symbols(word: Column) -> Column:
    chars = F.filter(F.split(word, ""), lambda x: x != "")
    return F.concat(chars, F.array(F.lit(END)))


def _merge_expr(sym: Column, a: str, b: str) -> Column:
    """Greedy leftmost non-overlapping replacement of adjacent
    (a, b) with a+b — the BPE merge rule — as a pure JVM aggregate
    lambda over the symbol array."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(left, right, cnt) for every adjacent symbol pair, weighted by
    word count; single-symbol words contribute nothing."""
    return (
        words.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1).alias("l"),
                    F.slice(F.col("sym"), 2, F.size("sym") - 1).alias("r"),
                )
            ).alias("p"),
        )
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("cnt").alias("pair_count"))
    )


#: vocabulary bound under which the merge loop runs driver-side over
#: the collected (word, cnt) frame (r11, guide §8): each Spark
#: iteration on a vocabulary-sized frame is ~2 fixed-cost jobs — 24
#: scheduling round-trips to argmax over a few thousand rows. Below
#: the bound the SAME deterministic loop runs in Python on the
#: collected vocab (32k words × ~8 symbols × n_merges ≈ 3M scalar ops,
#: well under a second); past it (real web-scale vocabularies) the
#: distributed loop below is unchanged. Results are bit-identical:
#: same greedy leftmost fold, same (count desc, left, right) argmax —
#: Python's code-point string order equals Spark's UTF8 byte order
#: for every code point (UTF-8 preserves code-point order) — pinned
#: by tests against the Spark loop and the pure-Python reference.
BPE_LOCAL_TRAIN_MAX_VOCAB = 32_768


def _train_merges_local(
    vocab: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side replica of the distributed merge loop — identical
    arithmetic, ordering and early stop."""
    syms: list[tuple[list[str], int]] = [
        (list(word) + [END], int(cnt)) for word, cnt in vocab
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, cnt in syms:
            for pair in zip(sym, sym[1:]):
                counts[pair] = counts.get(pair, 0) + cnt
        best = None
        for (left, right), c in counts.items():
            if c < min_pair_count:
                continue
            key = (-c, left, right)
            if best is None or key < best[0]:
                best = (key, left, right, c)
        if best is None:
            break
        _key, a, b, n = best
        merges.append((rank, a, b, n))
        merged = a + b
        nxt: list[tuple[list[str], int]] = []
        for sym, cnt in syms:
            out: list[str] = []
            for x in sym:
                # greedy leftmost non-overlapping — the _merge_expr fold
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            nxt.append((out, cnt))
        syms = nxt
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    local_vocab_bound: int = BPE_LOCAL_TRAIN_MAX_VOCAB,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns an
    ordered merge table ``(rank, left, right, pair_count)``.

    Deterministic: argmax ties break lexicographically on
    (left, right); training stops early when no pair reaches
    ``min_pair_count`` (merging singleton pairs only memorizes
    individual words). One corpus pass builds the (word, cnt)
    vocabulary; when it fits ``local_vocab_bound`` the merge loop runs
    driver-side (see BPE_LOCAL_TRAIN_MAX_VOCAB), else distributed.
    ``local_vocab_bound=0`` forces the distributed loop.

    ``vocab`` (r11, guide §1.2): a precomputed ``(word, cnt)``
    vocabulary frame — callers that also consume the vocabulary (a
    segmented sample, the tokenize join) pass it so the corpus explode
    + groupBy runs once. Must equal exactly what the internal
    aggregation would produce, and should be materialized
    (localCheckpoint/persist) since training reads it repeatedly."""
    spark = docs.sparkSession
    schema = "rank long, left string, right string, pair_count long"
    if vocab is None:
        vocab = (
            docs.select(F.explode(_words(F.col(text_col))).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
            # the ONE corpus-wide pass; everything after is vocab-sized
            .localCheckpoint()
        )
    if local_vocab_bound:
        # bounded probe and collect fused into ONE job: pull at most
        # bound+1 rows — if the extra row arrives the vocabulary is
        # over the bound (rows discarded, distributed loop below),
        # else these rows ARE the vocabulary. Never corpus-scale.
        rows = vocab.limit(local_vocab_bound + 1).collect()
        if len(rows) <= local_vocab_bound:
            return spark.createDataFrame(
                _train_merges_local(
                    [(r.word, r.cnt) for r in rows], n_merges, min_pair_count
                ),
                schema,
            )
    words = vocab.select(_initial_symbols(F.col("word")).alias("sym"), "cnt")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(words)
            .filter(F.col("pair_count") >= min_pair_count)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0].left, best[0].right, best[0].pair_count
        merges.append((rank, a, b, n))
        words = words.select(
            _merge_expr(F.col("sym"), a, b).alias("sym"), "cnt"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def bpe_apply(
    words: DataFrame,
    merge_rows: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """Apply a trained merge chain to a word frame, appending
    ``out_col`` with the piece array (checkpointed every few merges to
    bound expression depth). Vocabulary-sized work only."""
    out = words.withColumn(out_col, _initial_symbols(F.col(word_col)))
    for i, (a, b) in enumerate(merge_rows):
        out = out.withColumn(out_col, _merge_expr(F.col(out_col), a, b))
        if (i + 1) % 8 == 0:
            out = out.localCheckpoint()
    return out


def bpe_segment(
    docs: DataFrame,
    merge_rows: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list:
    ``(id, word, pieces)`` — one row per token occurrence.

    The merge chain is applied to the DISTINCT word frame (vocabulary-
    sized, via ``bpe_apply``), then broadcast-joined back onto the
    exploded token stream — the expensive per-symbol work never
    touches corpus-scale rows."""
    toks = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    vocab = bpe_apply(toks.select("word").distinct(), merge_rows)
    return toks.join(F.broadcast(vocab), "word").select(
        id_col, "word", "pieces"
    )


def bpe_train_sql(
    n_merges: int,
    min_pair_count: int = 2,
    table: str = "documents",
    text_col: str = "text",
    n_sample: int = 0,
) -> str:
    """DuckDB twin of ``bpe_train`` — the identical ``n_merges``
    iterations unrolled as MATERIALIZED CTE pairs (best_i: the argmax
    with the same >= min_pair_count cutoff and (count DESC, left,
    right) tie-break; vocab_i: the greedy leftmost rewrite as a
    delimiter-wrapped string replace — see the module docstring for
    the equivalence argument). MATERIALIZED is load-bearing: each CTE
    is referenced twice, so inlining would re-evaluate the chain
    exponentially. An empty best_i passes the vocabulary through
    unchanged (LEFT JOIN), mirroring the engine's early stop — once no
    pair reaches the cutoff the vocabulary is a fixed point, so all
    later best rows stay empty too.

    With ``n_sample`` > 0, appends the segmented-corpus sample rows
    the round-6 query publishes: the top ``n_sample`` words by
    (count DESC, word), each with its final piece sequence from
    vocab_{n_merges} — ``(100+rn, word, pieces joined by ' ', cnt)``
    in the same 4-column schema."""
    D = "chr(1)"
    DD = f"{D}||{D}"
    parts = [
        "\nWITH "
        + _vocab_cte_chain(n_merges, min_pair_count, table, text_col)
    ]
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS left, r AS right,"
        f" pc AS pair_count FROM best_{i}"
        for i in range(1, n_merges + 1)
    ]
    if n_sample > 0:
        parts.append(f""",
top_words AS (
  SELECT word, cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rn
  FROM words ORDER BY cnt DESC, word LIMIT {n_sample}
)""")
        selects.append(f"""
SELECT CAST(100 + t.rn AS BIGINT) AS rank, t.word AS left,
       array_to_string(list_transform(string_split(v.seq, {DD}),
                                      x -> trim(x, {D})), ' ') AS right,
       t.cnt AS pair_count
FROM top_words t JOIN vocab_{n_merges} v ON t.word = v.word""")
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


def bpe_tokenize_sql(
    n_merges: int,
    min_pair_count: int = 2,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``bpe_segment`` rolled up per document: replay
    the identical merge chain on the distinct-word frame (the same
    CTE chain as ``bpe_train_sql``), derive each word's piece count
    from its final symbol sequence, and join back onto the exploded
    token stream — ``(doc, n_words, n_pieces)`` per document with at
    least one token. Piece counts include the ``</w>`` end-of-word
    marker, matching the engine's piece arrays."""
    D = "chr(1)"
    DD = f"{D}||{D}"
    return f"""
WITH {_vocab_cte_chain(n_merges, min_pair_count, table, text_col)},
piece_counts AS (
  SELECT word, CAST(len(string_split(seq, {DD})) AS BIGINT) AS np
  FROM vocab_{n_merges}
),
toks AS (
  SELECT CAST({id_col} AS BIGINT) AS doc,
         unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS word
  FROM {table}
)
SELECT doc, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(np) AS BIGINT) AS n_pieces
FROM toks JOIN piece_counts USING (word)
WHERE word <> ''
GROUP BY doc
"""


def _vocab_cte_chain(
    n_merges: int,
    min_pair_count: int,
    table: str,
    text_col: str,
) -> str:
    """The shared merge-replay CTE chain: ``words`` (distinct word
    counts), ``vocab_0`` (char-split symbols), then ``best_i`` /
    ``vocab_i`` pairs for each unrolled merge. Callers prefix
    ``WITH `` and append their own final CTEs/selects."""
    D = "chr(1)"
    DD = f"{D}||{D}"
    parts = [f"""words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS word
    FROM {table}) WHERE word <> '' GROUP BY word
),
vocab_0 AS MATERIALIZED (
  SELECT word, cnt,
         regexp_replace(word, '(.)', {D} || '\\1' || {D}, 'g')
           || {D} || '</w>' || {D} AS seq
  FROM words
)"""]
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(f""",
best_{i} AS MATERIALIZED (
  SELECT l, r, pc FROM (
    SELECT s[i] AS l, s[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS pc
    FROM (SELECT cnt, list_transform(string_split(seq, {DD}),
                                     x -> trim(x, {D})) AS s
          FROM vocab_{p}),
         unnest(generate_series(1, len(s)-1)) AS t(i)
    GROUP BY 1, 2)
  WHERE pc >= {min_pair_count} ORDER BY pc DESC, l, r LIMIT 1
),
vocab_{i} AS MATERIALIZED (
  SELECT word, cnt,
         CASE WHEN b.l IS NULL THEN seq
              ELSE replace(seq, {D}||b.l||{D}||{D}||b.r||{D},
                           {D}||b.l||b.r||{D}) END AS seq
  FROM vocab_{p} LEFT JOIN best_{i} b ON TRUE
)""")
    return "".join(parts)
