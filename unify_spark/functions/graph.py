"""Distributed connected components + duplicate-cluster utilities.

The step after candidate generation in every production dedup pipeline:
near-duplicate candidate PAIRS (minhash/simhash/LSH output) become duplicate
CLUSTERS via connected components, and one canonical document is kept per
cluster.

Algorithm: iterative min-label propagation over the (sparse) candidate edge
set — each round every node takes the minimum label among itself and its
neighbors — accelerated with POINTER DOUBLING (path shortcutting: each
node's label jumps to its label's label every round, the Hash-to-Min /
star-contraction idea). One-hop propagation alone converges in O(cluster
diameter) rounds, fine for the dense shallow clusters near-dup graphs
usually form but fatal on the long similarity chains versioned/template
corpora produce (doc_v1≈doc_v2≈…≈doc_v500); with the shortcut step the
label distance to the component minimum halves each round, so convergence
is O(log diameter) — ~10 rounds covers chains of 1000 nodes, and the
default max_iter=50 covers any graph that fits in storage. Each round is
two key-only shuffles (neighbor-min aggregate + shortcut self-join);
lineage is cut with localCheckpoint every round so the plan does not grow
exponentially across iterations (the standard iterative-DataFrame pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the minimum node id of the connected component (deterministic). Raises
    if not converged within ``max_iter`` rounds — with pointer doubling that
    takes a component of diameter ~2^max_iter, so the default is a safety
    net, not a tuning knob."""
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
        # one-hop: each node's new label = min(own, neighbors' labels).
        # The node's OWN previous label rides the union as a tagged row and
        # is re-extracted by the aggregate, so the end-of-round convergence
        # check below is a filter over the (already materialized)
        # checkpoint — the former new-vs-old join cost two extra exchanges
        # per round for the same answer.
        nbr = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("label"), F.lit(False).alias("_own"))
        )
        hop = (
            labels.select("node", "label", F.lit(True).alias("_own"))
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("_own"), F.col("label"))).alias("_old"),
            )
        )
        # pointer doubling: jump to the label's label. Every label value is
        # itself a node id with a (smaller-or-equal) label, so the inner
        # lookup always hits and only decreases — path length to the
        # component minimum halves per round.
        lk = hop.select(F.col("node").alias("_ln"), F.col("label").alias("_ll"))
        # the changed-count rides the checkpoint's materialization job as an
        # Observation metric — zero extra jobs per round (the former
        # separate count() was a full scheduling round trip every round)
        from pyspark.sql import Observation

        obs = Observation()
        new_labels = (
            hop.join(lk, hop["label"] == lk["_ln"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("_ll", F.col("label"))).alias("label"),
                "_old",
            )
            .observe(obs, F.count(F.when(F.col("label") != F.col("_old"), 1)).alias("changed"))
            .localCheckpoint()
        )
        changed = obs.get["changed"]
        labels = new_labels.select("node", "label")
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
    max_iter: int = 50,
) -> DataFrame:
    """Documents → (id, cluster) via MinHash-LSH candidates filtered by
    estimated Jaccard, then connected components. Documents with no
    near-duplicate edge keep their own id as cluster (singletons).
    ``max_iter`` bounds the CC rounds (escape hatch for pathological
    graphs; see connected_components)."""
    from unify_spark.functions import dedup

    pairs = dedup.minhash_candidates(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands
    ).where(F.col("est_jaccard") >= min_est_jaccard)
    cc = connected_components(pairs, "id_a", "id_b", max_iter=max_iter)
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
    by id.

    Scale shape: the per-cluster ranking window sees only a slim
    (id, cluster[, prefer]) projection — at 100 TB the text IS the table,
    so full rows must not shuffle through the window. Winner ids then
    semi-join back to ``df`` to produce the kept rows (the same
    hash-not-payload pattern as EqualityAcrossTablesConstraint)."""
    from pyspark.sql import Window

    slim_cols = [id_col] + ([prefer] if prefer else [])
    slim = df.select(*slim_cols).join(clusters, on=id_col)
    order = (
        [F.desc(prefer), F.col(id_col)] if prefer else [F.col(id_col)]
    )
    w = Window.partitionBy("cluster").orderBy(*order)
    winners = (
        slim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster")
    )
    return df.join(winners, on=id_col, how="inner")
