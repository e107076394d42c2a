"""Near-duplicate clustering: connected components over the pair graph
and keep-one-representative dedup.

The pair operators (minhash/simhash/ngram/embedding) emit edges; a
production dedup pipeline then keeps ONE document per connected
component — usually the highest-quality one — not one per pair.

Components via iterative min-label propagation (each node adopts the
smallest id reachable in one hop, repeated to fixpoint). Convergence
takes O(component diameter) rounds — near-dup clusters are shallow
(dozens of rounds would mean a pathological chain), and each round is
one shuffle on node id. For adversarial graphs at cluster scale,
swap in the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same join shape,
provably O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    ``pairs`` rows are undirected edges. Nodes not present in any edge
    are absent from the result (callers treat them as singletons).
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy("a").agg(F.min("b").alias("lbl"))
        .select(F.col("a").alias("node"), F.least("a", "lbl").alias("component"))
        .persist()
    )
    for _ in range(max_iter):
        # each node adopts the min of its own label and its neighbors'
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nc"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nc"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_near_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Drop near-duplicates, keeping one representative per component:
    the highest ``quality_col`` (ties → smallest id), or the smallest
    id when no quality column is given. Documents outside any pair are
    singletons and always kept."""
    comp = connected_components(pairs)
    tagged = df.join(
        comp, df[id_col] == comp.node, "left"
    ).withColumn("_comp", F.coalesce(F.col("component"), df[id_col]))

    order = (
        [F.col(quality_col).desc_nulls_last(), F.col(id_col).asc()]
        if quality_col
        else [F.col(id_col).asc()]
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("_comp").orderBy(*order)
    return (
        tagged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_comp", "node", "component")
    )
