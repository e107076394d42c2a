"""Brute-force cosine similarity search over an embedding column.

The exact baseline: score every vector against the query with built-in
array expressions (``zip_with`` + ``aggregate`` — JVM-side, no Python),
then top-k via ``orderBy().limit(k)`` → TakeOrderedAndProject (per-
partition heaps, no global sort). This is the correct-by-construction
reference; the LSH/IVF variants in .lsh trade recall for candidate
pruning at scale.

Determinism: all arithmetic in double, summation strictly left-to-right
(``aggregate`` folds sequentially), results rounded to 6 decimals —
bit-compatible with the DuckDB oracle's identical fold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product, summed strictly left-to-right in double.

    With ``dim`` known the fold can be UNROLLED into a flat
    expression of ``dim`` multiply-adds. Measured (sf0.1, 64-dim,
    best-of-2 warm runs): the HOF fold beats the unrolled form ~3x at
    EVERY call site tried, including the 100k-pair knn_join broadcast
    cross — the flat 64-term tree inflates analysis/codegen and,
    stacked several times in one projection (cosine = dot + 2 norms;
    LSH planes; IVF centroids), blows Janino's 64 KB method limit and
    disables whole-stage codegen for the stage. Default to
    ``dim=None`` everywhere; ``dim`` stays supported for plan
    experiments. Both forms start from ``lit(0.0)`` and add terms in
    index order, so they are bit-identical to each other and to the
    DuckDB oracle's ``list_reduce``."""
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            x = F.get(a, i).cast("double")
            acc = acc + x * x
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _safe_cos_div(num: Column, den: Column) -> Column:
    """Cosine division guarded against zero-norm vectors: a zero
    embedding (failed/padded row) has no direction, so its cosine is
    NULL — under Spark 4's default ANSI mode the raw division ABORTS
    the job with DIVIDE_BY_ZERO, and with ANSI off it yields NaN,
    which both passes ``>= threshold`` filters and sorts FIRST in
    descending top-k order (r4 review). NULL does neither."""
    return F.when(den != F.lit(0.0), num / den)


def cosine_similarity(
    a: Column, b: Column, decimals: int = 6, dim: int | None = None
) -> Column:
    return F.round(
        _safe_cos_div(_dot(a, b, dim), _norm(a, dim) * _norm(b, dim)),
        decimals,
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query_vec``:
    ``(id, cosine)``, ties broken by id for determinism."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())  # zero-norm rows out
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


#: refuse to broadcast-cartesian a right side bigger than this many
#: rows (≈1M × 64-dim float ≈ 256 MB broadcast — already generous).
KNN_JOIN_MAX_RIGHT_ROWS = 1_000_000


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    max_right_rows: int = KNN_JOIN_MAX_RIGHT_ROWS,
    dim: int | None = None,
) -> DataFrame:
    """Exact k-NN join: for each left row, its k nearest right rows by
    cosine. The right side is broadcast and scored against every left
    row — exact by construction, and a deliberate scale-killer if the
    right side is large, so it REFUSES when ``right`` exceeds
    ``max_right_rows``. The guard is a limit-probe (count of
    ``limit(max+1)`` on the pruned id column), so it reads at most
    max+1 rows — it never full-scans a 100 TB right side just to
    refuse it. For large-vs-large, use lsh.embedding_near_pairs /
    lsh_topk / ivf_topk; to override knowingly, raise
    ``max_right_rows``."""
    from pyspark.sql.window import Window

    if right.select(right_id).limit(max_right_rows + 1).count() > max_right_rows:
        raise ValueError(
            f"knn_join right side exceeds max_right_rows={max_right_rows}: "
            "a broadcast cartesian at this size is a scale-killer. Use "
            "similarity.lsh.embedding_near_pairs / lsh_topk or "
            "similarity.ivf.ivf_topk for large right sides, or raise "
            "max_right_rows explicitly."
        )
    scored = cross_scores(
        left, right, vec_col, left_id, right_id, dim, guard=False
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def cross_scores(
    left: DataFrame,
    right: DataFrame,
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    dim: int | None = None,
    guard: bool = True,
    max_right_rows: int = KNN_JOIN_MAX_RIGHT_ROWS,
    vectorized: bool | None = None,
) -> DataFrame:
    """The broadcast cross-score frame ``(qid, nid, cosine)`` both
    knn_join and bitext_mine rank over — factored out so a consumer
    that needs BOTH directions (bitext's forward and backward k-NN)
    scores the symmetric matrix once instead of twice. Zero-norm rows
    (NULL cosine) are already filtered; cosines carry knn_join's
    6-decimal rounding.

    ``vectorized`` picks the scoring backend — None (default) switches
    to the Arrow/numpy cross fold (r12; same bit-exactness contract as
    lsh._sig_vectorized) when the right side holds at least
    ``_VECTORIZED_MIN_RIGHT`` rows. The interpreted zip_with+aggregate
    fold costs ~100-200us PER PAIR (measured r12: the 1M-pair bitext
    cross was 6.7 s of an 7.9 s row), so at any real pair count the
    numpy fold wins by 10x+; tiny right sides keep the all-JVM plan
    (no Python worker involved). Both backends are BIT-IDENTICAL
    (tests/test_similarity.py::test_cross_scores_vectorized_bit_exact)
    so the switch is purely a cost decision."""
    probe_cap = (
        max_right_rows + 1 if guard else _VECTORIZED_MIN_RIGHT
    )
    if guard or vectorized is None:
        cnt = right.select(right_id).limit(probe_cap).count()
        if guard and cnt > max_right_rows:
            raise ValueError(
                f"cross_scores right side exceeds max_right_rows="
                f"{max_right_rows}: a broadcast cartesian at this size is "
                "a scale-killer. Use similarity.lsh / similarity.ivf "
                "candidates."
            )
        if vectorized is None:
            # pair count is what pays for the Python round-trips, so
            # BOTH sides must clear the bar (knn_join probes 50 query
            # vectors against the full table — 100k pairs stay faster
            # all-JVM; the probe reads at most 256 ids)
            vectorized = cnt >= _VECTORIZED_MIN_RIGHT and (
                left.select(left_id)
                .limit(_VECTORIZED_MIN_RIGHT)
                .count()
                >= _VECTORIZED_MIN_RIGHT
            )
    if vectorized:
        out = _cross_scores_vectorized(
            left, right, vec_col, left_id, right_id, dim
        )
        if out is not None:
            return out
        # empty right side: fall through to the (trivially empty) JVM
        # plan so the output schema/laziness contract is unchanged
    # hoist the norms out of the cross score: one norm per vector
    # instead of one per (query, neighbor) pair — identical value
    # (same fold over the same vector), 2/3 fewer flops in the join
    l = left.select(
        F.col(left_id).alias("qid"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col), dim).alias("_qn"),
    )
    r = right.select(
        F.col(right_id).alias("nid"),
        F.col(vec_col).alias("_nv"),
        _norm(F.col(vec_col), dim).alias("_nn"),
    )
    return (
        l.join(F.broadcast(r), F.lit(True))
        .select(
            "qid",
            "nid",
            F.round(
                _safe_cos_div(
                    _dot(F.col("_qv"), F.col("_nv"), dim),
                    F.col("_qn") * F.col("_nn"),
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())  # zero-norm rows out
    )


#: right-side row count above which cross_scores switches to the
#: Arrow/numpy backend. Below it the Python worker round-trip costs
#: more than the handful of JVM folds it replaces; above it the
#: interpreted fold's ~100-200us/pair dwarfs everything else.
_VECTORIZED_MIN_RIGHT = 256

#: cap on the (left-chunk x right) score-matrix cells a single numpy
#: block may hold (~32 MB of float64) — bounds task memory at any
#: right-side size instead of letting a 10k-row Arrow batch allocate
#: n_batch x m doubles.
_VECTORIZED_BLOCK_CELLS = 4_000_000


def _arrow_vec_rows(col):
    """Per-row ``(float64 view | None, null-element mask | None)``
    pairs from an arrow list<float/double> column. The validity
    bitmaps keep a null ELEMENT distinct from a genuine NaN — Arrow's
    float buffer stores both as NaN, but their JVM cosine semantics
    differ (null product -> NULL cosine vs NaN -> NaN cosine)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False)
    vals = col.values
    valid = (
        np.ones(len(col), dtype=bool)
        if col.null_count == 0
        else col.is_valid().to_numpy(zero_copy_only=False)
    )
    v64 = np.asarray(
        vals.cast(pa.float64()).to_numpy(zero_copy_only=False)
    )
    nullmask = (
        None
        if vals.null_count == 0
        else vals.is_null().to_numpy(zero_copy_only=False)
    )
    rows = []
    for i in range(len(col)):
        if not valid[i]:
            rows.append((None, None))
            continue
        lo, hi = offs[i], offs[i + 1]
        rows.append(
            (v64[lo:hi], None if nullmask is None else nullmask[lo:hi])
        )
    return rows


def _classify_vec(vec, nullmask, k: int | None):
    """JVM-cosine row class for one vector (slice to ``k`` when the
    dim-unrolled expression semantics apply):

    - ``skip``: NULL vector, too short for ``k``, length-group misfit
      handled by the caller, or a null element — every cosine of this
      row is provably NULL and the downstream isNotNull filter would
      drop it, so no pair is emitted at all;
    - ``nan``: a NaN element (and no null) — every equal-length/
      first-k cosine is NaN (NaN product poisons the fold, and the
      norm side keeps the NaN through ``when(den != 0.0)``);
    - ``inf``: an infinite element — the fold can overflow to
      inf/-inf/NaN in value-dependent ways, so pairs go through the
      exact scalar emulation;
    - ``clean``: finite values only — the vectorized matrix fold.
    """
    import numpy as np

    if vec is None:
        return "skip", None
    if k is not None:
        if len(vec) < k:
            return "skip", None
        vec = vec[:k]
        nullmask = None if nullmask is None else nullmask[:k]
    if nullmask is not None and nullmask.any():
        return "skip", None
    if np.isnan(vec).any():
        return "nan", vec
    if np.isinf(vec).any():
        return "inf", vec
    return "clean", vec


def _fold_dot_block(Q, R):
    """DOT[i, j] = ((0 + q0*r0) + q1*r1) + ... with ascending element
    index — exactly the HOF fold's left-to-right order (brute._dot),
    one IEEE double multiply and one IEEE double add per term, so
    every intermediate (and the result) is bit-identical to the JVM
    expression."""
    import numpy as np

    DOT = np.zeros((Q.shape[0], R.shape[0]), dtype=np.float64)
    for j in range(Q.shape[1]):
        DOT += np.multiply.outer(Q[:, j], R[:, j])
    return DOT


def _fold_norms(Q):
    """sqrt of the ascending-index sum of squares — brute._norm's
    exact fold; np.sqrt and Java Math.sqrt are both the correctly
    rounded IEEE sqrt."""
    import numpy as np

    acc = np.zeros(Q.shape[0], dtype=np.float64)
    for j in range(Q.shape[1]):
        x = Q[:, j]
        acc += x * x
    return np.sqrt(acc)


def _scalar_cross_pair(a, b):
    """Exact Python-float emulation of one pair's (dot, den) under the
    JVM expression, for the rare inf-carrying rows: Python floats ARE
    IEEE doubles, so the ascending fold reproduces every intermediate.
    Returns (num, den, nan_flag) with the wire invariant that num/den
    are never NaN (pandas->Arrow silently nulls NaN): a NaN dot or
    den means the JVM cosine is NaN, carried as the flag instead."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        x = float(x)
        na = na + x * x
    nb = 0.0
    for y in b:
        y = float(y)
        nb = nb + y * y
    den = math.sqrt(na) * math.sqrt(nb)
    if math.isnan(dot) or math.isnan(den):
        return 0.0, 1.0, True
    return dot, den, False


def _group_vec_rows(rows, ids, k: int | None):
    """Bucket classified rows for the cross fold. Returns
    {length: {"ids": [...], "Q": matrix, "qn": norms,
              "nan_ids": [...], "inf": [(id, vec)]}} — in dim mode
    (k given) there is a single pseudo-group keyed by k."""
    import numpy as np

    groups: dict = {}
    for (vec, nullmask), rid in zip(rows, ids):
        cls, v = _classify_vec(vec, nullmask, k)
        if cls == "skip":
            continue
        key = k if k is not None else len(v)
        g = groups.setdefault(
            key, {"ids": [], "vecs": [], "nan_ids": [], "inf": []}
        )
        if cls == "clean":
            g["ids"].append(rid)
            g["vecs"].append(v)
        elif cls == "nan":
            g["nan_ids"].append(rid)
        else:
            g["inf"].append((rid, v))
    for key, g in groups.items():
        if g["vecs"]:
            g["Q"] = np.stack(g["vecs"]).astype(np.float64, copy=False)
        else:
            g["Q"] = np.zeros((0, key), dtype=np.float64)
        del g["vecs"]
        g["qn"] = _fold_norms(g["Q"])
    return groups


def _cross_scores_vectorized(
    left: DataFrame,
    right: DataFrame,
    vec_col: str,
    left_id: str,
    right_id: str,
    dim: int | None,
) -> DataFrame | None:
    """Arrow/numpy backend for cross_scores: the (guarded,
    broadcast-sized) right side is collected once, its clean vectors
    stacked into per-length float64 matrices, and a mapInArrow pass
    over the LEFT side emits ``(qid, nid, _num, _den, _nan)``
    id+double rows — the heavy vector payloads cross the Python
    boundary once per ROW, never once per pair, and the division +
    HALF_UP rounding stay in the JVM so no rounding semantics are
    re-implemented:

        cosine = round(when(_nan, NaN)
                       .when(_den != 0.0, _num / _den), 6)

    is term-for-term ``round(_safe_cos_div(dot, qn*nn), 6)`` with dot,
    qn, nn produced by the bit-exact ascending folds above. Pairs
    whose JVM cosine is provably NULL (null/short vector, null
    element, length mismatch) are simply not emitted — the JVM path
    ends in ``.filter(cosine.isNotNull())`` which drops exactly those.
    ``_num``/``_den`` are never NaN on the wire (pandas/Arrow return
    paths silently null NaN): a NaN JVM cosine rides ``_nan`` instead.
    Returns None for an empty right side (caller keeps the JVM plan).
    """
    import numpy as np

    tbl = right.select(
        F.col(right_id).alias("nid"), F.col(vec_col).alias("_nv")
    ).toArrow()
    if tbl.num_rows == 0:
        return None
    nid_py = tbl.column("nid").to_pylist()
    r_rows = _arrow_vec_rows(tbl.column("_nv"))
    payload = {}
    for key, g in _group_vec_rows(
        r_rows, list(range(tbl.num_rows)), dim
    ).items():
        payload[key] = {
            "R": g["Q"],
            "rn": g["qn"],
            "nids": [nid_py[i] for i in g["ids"]],
            "nan_nids": [nid_py[i] for i in g["nan_ids"]],
            "inf": [(nid_py[i], v) for i, v in g["inf"]],
        }
    nid_pa_type = tbl.schema.field("nid").type
    bc = left.sparkSession.sparkContext.broadcast(
        (payload, dim, nid_pa_type)
    )

    qid_dt = left.select(F.col(left_id)).schema.fields[0].dataType
    nid_dt = right.select(F.col(right_id)).schema.fields[0].dataType
    out_schema = (
        f"qid {qid_dt.simpleString()}, nid {nid_dt.simpleString()}, "
        "_num double, _den double, _nan boolean"
    )

    def score(batches):
        import numpy as np
        import pyarrow as pa

        r_payload, k, nid_pa_type = bc.value

        def emit(qids, nids, num, den, nan, qtype, ntype):
            if not isinstance(qids, pa.Array):
                qids = pa.array(qids, type=qtype)
            if not isinstance(nids, pa.Array):
                nids = pa.array(nids, type=ntype)
            return pa.record_batch(
                [
                    qids,
                    nids,
                    pa.array(np.asarray(num, dtype=np.float64)),
                    pa.array(np.asarray(den, dtype=np.float64)),
                    pa.array(np.asarray(nan, dtype=bool)),
                ],
                names=["qid", "nid", "_num", "_den", "_nan"],
            )

        for batch in batches:
            qtype = batch.schema.field(0).type
            qid_py = batch.column(0).to_pylist()
            l_groups = _group_vec_rows(
                _arrow_vec_rows(batch.column(1)),
                list(range(len(qid_py))),
                k,
            )
            for key, lg in l_groups.items():
                rg = r_payload.get(key)
                if rg is None:
                    continue
                R, rn, nids = rg["R"], rg["rn"], rg["nids"]
                m = len(nids)
                Q, qn = lg["Q"], lg["qn"]
                l_ids = [qid_py[i] for i in lg["ids"]]
                l_nan = [qid_py[i] for i in lg["nan_ids"]]
                l_inf = [(qid_py[i], v) for i, v in lg["inf"]]
                nid_arr = (
                    pa.array(nids, type=nid_pa_type) if m else None
                )
                # clean x clean: blocked matrix fold
                if m and l_ids:
                    rows_per_block = max(
                        1, _VECTORIZED_BLOCK_CELLS // m
                    )
                    for lo in range(0, len(l_ids), rows_per_block):
                        hi = min(lo + rows_per_block, len(l_ids))
                        DOT = _fold_dot_block(Q[lo:hi], R)
                        DEN = np.multiply.outer(qn[lo:hi], rn)
                        # finite float64 inputs can still overflow the
                        # fold to inf, and inf*0 / inf-inf make NaN —
                        # the JVM cosine for those cells is NaN, which
                        # must ride the flag (NaN doubles do not
                        # survive the Arrow return path)
                        nan_cells = np.isnan(DOT) | np.isnan(DEN)
                        if nan_cells.any():
                            DOT = np.where(nan_cells, 0.0, DOT)
                            DEN = np.where(nan_cells, 1.0, DEN)
                        n_blk = hi - lo
                        yield emit(
                            pa.array(l_ids[lo:hi], type=qtype).take(
                                pa.array(np.repeat(np.arange(n_blk), m))
                            ),
                            nid_arr.take(
                                pa.array(np.tile(np.arange(m), n_blk))
                            ),
                            DOT.ravel(),
                            DEN.ravel(),
                            nan_cells.ravel(),
                            qtype,
                            None,
                        )
                # exceptional rows (NaN / inf classes): tiny by
                # construction, resolved pair-by-pair with the exact
                # scalar emulation or the NaN-poisoning rule
                sp_q, sp_n, sp_num, sp_den, sp_nan = [], [], [], [], []

                def nan_pair(q, n):
                    sp_q.append(q)
                    sp_n.append(n)
                    sp_num.append(0.0)
                    sp_den.append(1.0)
                    sp_nan.append(True)

                def exact_pair(q, n, a, b):
                    num, den, nanf = _scalar_cross_pair(a, b)
                    sp_q.append(q)
                    sp_n.append(n)
                    sp_num.append(num)
                    sp_den.append(den)
                    sp_nan.append(nanf)

                nan_partners = (
                    nids
                    + rg["nan_nids"]
                    + [nid for nid, _ in rg["inf"]]
                )
                for q in l_nan:  # Lnan x (Rclean|Rnan|Rinf)
                    for n in nan_partners:
                        nan_pair(q, n)
                for n in rg["nan_nids"]:  # (Lclean|Linf) x Rnan
                    for q in l_ids:
                        nan_pair(q, n)
                    for q, _ in l_inf:
                        nan_pair(q, n)
                for q, a in l_inf:  # Linf x (Rclean|Rinf)
                    for ri in range(m):
                        exact_pair(q, nids[ri], a, R[ri])
                    for n, b in rg["inf"]:
                        exact_pair(q, n, a, b)
                for n, b in rg["inf"]:  # Lclean x Rinf
                    for li in range(len(l_ids)):
                        exact_pair(l_ids[li], n, Q[li], b)
                if sp_q:
                    # right-id type from the payload values; build via
                    # the declared output schema types
                    yield emit(
                        sp_q, sp_n, sp_num, sp_den, sp_nan,
                        qtype, nid_pa_type,
                    )

    mapped = left.select(
        F.col(left_id), F.col(vec_col)
    ).mapInArrow(score, out_schema)
    return mapped.select(
        "qid",
        "nid",
        F.round(
            F.when(F.col("_nan"), F.lit(float("nan"))).when(
                F.col("_den") != 0.0, F.col("_num") / F.col("_den")
            ),
            6,
        ).alias("cosine"),
    ).filter(F.col("cosine").isNotNull())
