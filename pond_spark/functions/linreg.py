"""Closed-form linear regression as a one-pass aggregation, with
exact-integer Cramer solve — model fitting expressed as the shuffle
pattern a 100 TB corpus can actually afford.

Fitting ``y ~ w0 + w1*x1 + w2*x2`` by least squares needs only the
normal-equation sums (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y)
— a single map-side-combinable aggregation to ONE row, regardless of
corpus size. The 3×3 solve happens inside that one row by Cramer's
rule; scoring the full corpus is then a broadcast of four scalars and
a map-only projection. No iteration, no driver-side matrix library,
no Python in the hot path.

Exactness: with integer features the whole chain stays in exact
DECIMAL(38,0) arithmetic — residuals are ranked on ``r_i·det =
det·y_i − det0 − det1·x1_i − det2·x2_i`` (the residual times the
common denominator), an integer, so the ranking is bit-identical in
any engine and the DuckDB twin hash-matches without float tolerance.

Magnitude budget (why this fits in 38 digits): the fit runs on a
deterministic sample of ``n_s`` rows (``id % sample_mod == 0`` — the
same bounded-training pattern as the IVF/PQ codebooks). Sums are
≤ n_s·max(x)·max(y), dets are sums of 6 three-sum products, and the
residual adds one more small factor:
``n_s·max(x)² ≤ 1e12`` keeps every det < 1e37 and every scaled
residual < 1e38. At 5k docs sampled /8 with x ≤ 1e2, y ≤ 1e3 the
dets are ~1e20 — four orders of headroom. Past the budget (~1e6
sampled rows of 1e3-scale features) you center/rescale features or
drop to double precision; the sample bound makes that a knob, not a
scale wall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: normal-equation sums. The 12-digit leaf cast IS the budget
#: enforcement: under Spark 4's default ANSI mode a sum past 1e12
#: fails LOUDLY at the cast (ARITHMETIC_OVERFLOW) — at exactly the
#: documented boundary, before any det product could silently
#: diverge from the HUGEINT oracle. (With ANSI disabled the cast
#: NULLs instead; callers running legacy mode lose the loud wall and
#: should check the model rows for NULL dets.) Widening the leaf
#: would not buy range: det ~ sum^3 must stay under 1e38, so the
#: true value budget is ~1e12 regardless of leaf precision.
_D = "decimal(12,0)"


def _det3(a: list[list[Column]]) -> Column:
    """Determinant of a 3x3 of DECIMAL(12,0) columns — six products of
    three, so precision peaks at 12+12+1 ... 38 and never truncates."""
    return (
        a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
        - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
        + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
    )


def linreg_outliers(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
    k: int = 25,
    sample_mod: int = 8,
    checkpoint_model: bool = True,
) -> DataFrame:
    """Fit ``y ~ 1 + x1 + x2`` on the ``id % sample_mod == 0`` sample,
    then return the ``k`` docs (over the FULL corpus) with the largest
    absolute scaled residual — the rows the linear model explains
    worst, a structural-quality outlier signal. Output: ``(rank, doc,
    y, x1, x2, resid)`` with ``resid = det·y − Σ det_j·x_j`` as a
    STRING (exact integer, engine-portable), plus four model rows at
    rank 101..104 carrying (det, det0, det1, det2) so the fitted model
    itself is part of the attested result. All x/y values must be
    non-negative integers within the module's magnitude budget."""
    rows = df.select(
        F.col(id_col).cast("long").alias("doc"),
        F.col(x1_col).cast("long").alias("x1"),
        F.col(x2_col).cast("long").alias("x2"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(
        F.col("x1").isNotNull() & F.col("x2").isNotNull() & F.col("y").isNotNull()
    ).persist()
    # persisted (r11, guide §2.4): the feature frame feeds BOTH the
    # model's sample aggregation and the full-corpus scoring pass —
    # unpinned, the caller's feature expressions (regex token counts)
    # ran twice. Four longs per doc; session pin, cleared by loop
    # drivers (the ngram-pin contract).
    sample = rows.filter(F.col("doc") % sample_mod == 0)

    def s(e: Column) -> Column:
        return F.sum(e).cast(_D)

    one = F.lit(1)
    sums = sample.agg(
        s(one).alias("n"),
        s(F.col("x1")).alias("s1"),
        s(F.col("x2")).alias("s2"),
        s(F.col("x1") * F.col("x1")).alias("s11"),
        s(F.col("x1") * F.col("x2")).alias("s12"),
        s(F.col("x2") * F.col("x2")).alias("s22"),
        s(F.col("y")).alias("sy"),
        s(F.col("x1") * F.col("y")).alias("s1y"),
        s(F.col("x2") * F.col("y")).alias("s2y"),
    )
    c = {f: F.col(f) for f in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")}
    A = [
        [c["n"], c["s1"], c["s2"]],
        [c["s1"], c["s11"], c["s12"]],
        [c["s2"], c["s12"], c["s22"]],
    ]
    b = [c["sy"], c["s1y"], c["s2y"]]

    def repl(j: int) -> list[list[Column]]:
        return [[b[i] if jj == j else A[i][jj] for jj in range(3)] for i in range(3)]

    # the 1-row model feeds BOTH the scoring join and the rank-101+
    # attestation rows; localCheckpoint pins the four determinants so
    # the sample aggregation (a full-corpus scan) runs exactly once
    # (checkpoint_model=False keeps the plan transparent for audits)
    model = sums.select(
        _det3(A).alias("det"),
        _det3(repl(0)).alias("det0"),
        _det3(repl(1)).alias("det1"),
        _det3(repl(2)).alias("det2"),
    )
    if checkpoint_model:
        model = model.localCheckpoint(eager=False)

    scored = rows.crossJoin(F.broadcast(model)).select(
        "doc",
        "y",
        "x1",
        "x2",
        (
            F.col("det") * F.col("y")
            - F.col("det0")
            - F.col("det1") * F.col("x1")
            - F.col("det2") * F.col("x2")
        ).alias("r"),
    )
    top = (
        scored.orderBy(F.abs(F.col("r")).desc(), F.col("doc"))
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.abs(F.col("r")).desc(), F.col("doc")))
            .cast("long")
            .alias("rank"),
            "doc",
            "y",
            "x1",
            "x2",
            F.col("r").cast("string").alias("resid"),
        )
    )
    zero = F.lit(0).cast("long")
    model_rows = model.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(101 + i).cast("long").alias("rank"),
                        F.lit(-1).cast("long").alias("doc"),
                        zero.alias("y"),
                        zero.alias("x1"),
                        zero.alias("x2"),
                        F.col(nm).cast("string").alias("resid"),
                    )
                    for i, nm in enumerate(("det", "det0", "det1", "det2"))
                ]
            )
        ).alias("m")
    ).select("m.*")
    return top.unionByName(model_rows)


def linreg_outliers_sql(
    x1_expr: str,
    x2_expr: str,
    y_expr: str,
    k: int = 25,
    sample_mod: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: identical sums (HUGEINT — 128-bit, same 1e38
    ceiling as DECIMAL(38,0)), identical Cramer expansion, identical
    scaled-residual ranking; big integers stringify identically in
    both engines, so ``resid`` hashes exactly."""

    def det3(m: list[list[str]]) -> str:
        return (
            f"{m[0][0]}*({m[1][1]}*{m[2][2]} - {m[1][2]}*{m[2][1]})"
            f" - {m[0][1]}*({m[1][0]}*{m[2][2]} - {m[1][2]}*{m[2][0]})"
            f" + {m[0][2]}*({m[1][0]}*{m[2][1]} - {m[1][1]}*{m[2][0]})"
        )

    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    b = ["sy", "s1y", "s2y"]
    dets = {
        "det": det3(A),
        "det0": det3([[b[i] if j == 0 else A[i][j] for j in range(3)] for i in range(3)]),
        "det1": det3([[b[i] if j == 1 else A[i][j] for j in range(3)] for i in range(3)]),
        "det2": det3([[b[i] if j == 2 else A[i][j] for j in range(3)] for i in range(3)]),
    }
    det_sel = ",\n         ".join(f"{e} AS {n}" for n, e in dets.items())
    return f"""
WITH rows_all AS (
  SELECT CAST({id_col} AS BIGINT) AS doc,
         CAST({x1_expr} AS BIGINT) AS x1,
         CAST({x2_expr} AS BIGINT) AS x2,
         CAST({y_expr} AS BIGINT) AS y
  FROM {table}
  WHERE {x1_expr} IS NOT NULL AND {x2_expr} IS NOT NULL
    AND {y_expr} IS NOT NULL
),
sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
         CAST(sum(x1*x1) AS HUGEINT) AS s11,
         CAST(sum(x1*x2) AS HUGEINT) AS s12,
         CAST(sum(x2*x2) AS HUGEINT) AS s22,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x1*y) AS HUGEINT) AS s1y,
         CAST(sum(x2*y) AS HUGEINT) AS s2y
  FROM rows_all WHERE doc % {sample_mod} = 0
),
model AS (
  SELECT {det_sel}
  FROM sums
),
scored AS (
  SELECT doc, y, x1, x2,
         m.det*y - m.det0 - m.det1*x1 - m.det2*x2 AS r
  FROM rows_all, model m
),
top AS (
  SELECT CAST(row_number() OVER (ORDER BY abs(r) DESC, doc) AS BIGINT) AS rank,
         doc, y, x1, x2, CAST(r AS VARCHAR) AS resid
  FROM scored ORDER BY abs(r) DESC, doc LIMIT {k}
)
SELECT * FROM top
UNION ALL
SELECT * FROM (
  SELECT CAST(100 + u.i AS BIGINT) AS rank, CAST(-1 AS BIGINT) AS doc,
         CAST(0 AS BIGINT) AS y, CAST(0 AS BIGINT) AS x1,
         CAST(0 AS BIGINT) AS x2,
         CAST(CASE u.i WHEN 1 THEN det WHEN 2 THEN det0
              WHEN 3 THEN det1 ELSE det2 END AS VARCHAR) AS resid
  FROM model, (SELECT unnest([1,2,3,4]) AS i) u
)
"""
