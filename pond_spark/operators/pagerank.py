"""Fixed-iteration integer PageRank — the host/page authority signal
corpus-curation pipelines weight documents by (the Common Crawl
host-graph ranking family: quality-weighted sampling keys off a
centrality score per registered domain).

Numerics: everything is exact int64 arithmetic so results hash
identically across engines (PERF_NOTES rule — no float crosses a row
boundary). Ranks are stored ×``scale``; the damping factor is the
rational ``damping_num/damping_den`` applied as ``(num*x) div den``;
per-edge shares are ``rank div outdeg`` (floor). The tiny mass lost
to floor division and to dangling nodes is NOT redistributed — the
standard simplification when ranks are used as a relative ordering
signal, which is all curation weighting needs.

Scale: each of the (fixed, small) iterations is one join of the rank
relation (|V| rows — node ids and a long, never documents) against the
pre-aggregated edge relation plus one groupBy(dst) — both shuffle
node-ids only. The edge relation is deduplicated and persisted once;
``localCheckpoint`` truncates lineage per iteration so the plan stays
flat. Overflow headroom: one node's inflow is bounded by the total
mass ``|V|*scale``, so pick ``scale ≤ 2^62 / (|V| * damping_num)``
(the default 1e6 is safe past 4e12 nodes).

Reference anchor: Page et al. 1999; the integer-rational formulation
follows the repo's promo_bps / tfidf quantization pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "click_edges"]


def click_edges(
    logs: DataFrame,
    node_col: str = "message",
    user_col: str = "remote_host",
    ts_col: str = "timestamp",
    id_col: str = "id",
) -> DataFrame:
    """Directed click-graph edges: per-user consecutive page
    transitions in (ts, id) order, self-loops dropped, deduplicated to
    ``(src, dst)``. One user-keyed window pass (the event_transitions
    shape) + a distinct on the narrow edge pair."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = (
        logs.filter(
            F.col(node_col).isNotNull()
            & F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.lag(node_col).over(w).alias("src"),
            F.col(node_col).alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    )
    return steps.distinct()


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer PageRank over distinct directed ``(src, dst)`` edges.

    Returns ``(node, rank)`` with rank ×``scale``; every node seen as
    a src or dst gets a row (sink nodes receive inflow; source-only
    nodes keep the teleport floor). Deterministic: pure integer
    arithmetic, fixed iteration count, no sampling."""
    edges = edges.select("src", "dst").distinct().persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edge+outdeg staged once; reused by every iteration's join
    fanout = edges.join(outdeg, "src").persist()

    try:
        teleport = ((damping_den - damping_num) * scale) // damping_den
        ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
        for i in range(iterations):
            inflow = (
                ranks.join(fanout, ranks.node == fanout.src)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank div outdeg").alias("share"),
                )
                .groupBy("node")
                .agg(F.sum("share").alias("_in"))
            )
            ranks = (
                nodes.join(inflow, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(teleport).cast("long")
                        + F.expr(
                            f"CAST({damping_num} AS BIGINT) * coalesce(_in, 0) "
                            f"div CAST({damping_den} AS BIGINT)"
                        )
                    ).alias("rank"),
                )
                # the LAST checkpoint is eager: it materializes the
                # final ranks (|V| narrow rows) so every pin below can
                # be released before returning — otherwise the cached
                # edge/node/fanout blocks would accumulate in executor
                # storage across queries in a long-lived session
                .localCheckpoint(eager=(i == iterations - 1))
            )
        return ranks
    finally:
        fanout.unpersist()
        nodes.unpersist()
        edges.unpersist()
