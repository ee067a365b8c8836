"""Distributed connected components + duplicate-cluster utilities.

The step after candidate generation in every production dedup pipeline:
near-duplicate candidate PAIRS (minhash/simhash/LSH output) become duplicate
CLUSTERS via connected components, and one canonical document is kept per
cluster.

Algorithm: iterative min-label propagation over the (sparse) candidate edge
set — each round every node takes the minimum label among itself and its
neighbors, until no label changes. Convergence is O(cluster diameter)
rounds; near-dup clusters are dense and shallow (diameter ≤ ~3 in practice),
so a handful of rounds suffices even at 10^9 docs — the classic
alternating-star optimization only pays off on high-diameter graphs, which
dedup graphs are not. Each round is one shuffle on node id; lineage is cut
with localCheckpoint every round so the plan does not grow exponentially
across iterations (the standard iterative-DataFrame pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the minimum node id of the connected component (deterministic). Raises
    if not converged within ``max_iter`` rounds (dedup graphs converge in
    a few)."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # each node's new label = min(own, min over neighbors' labels)
        nbr = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.select("node", "label")
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Documents → (id, cluster) via MinHash-LSH candidates filtered by
    estimated Jaccard, then connected components. Documents with no
    near-duplicate edge keep their own id as cluster (singletons)."""
    from unify_spark.functions import dedup

    pairs = dedup.minhash_candidates(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands
    ).where(F.col("est_jaccard") >= min_est_jaccard)
    cc = connected_components(pairs, "id_a", "id_b")
    return (
        df.select(F.col(id_col).alias("node"))
        .join(cc, on="node", how="left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("cluster"),
        )
    )


def canonical_docs(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    prefer: str | None = None,
) -> DataFrame:
    """One kept row per duplicate cluster. Default canonical member is the
    minimum id (deterministic); pass ``prefer`` (a column name, e.g. a
    quality score) to keep the highest-scoring member instead, ties broken
    by id."""
    from pyspark.sql import Window

    joined = df.join(clusters, on=id_col)
    order = (
        [F.desc(prefer), F.col(id_col)] if prefer else [F.col(id_col)]
    )
    w = Window.partitionBy("cluster").orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
