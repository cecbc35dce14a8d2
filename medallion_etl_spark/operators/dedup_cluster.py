"""Fuzzy-dedup clustering: connected components over the MinHash/LSH
candidate-pair graph, producing one canonical document per near-dup
cluster — the step that turns pairwise similarity into an actual
keep/drop decision (the published fuzzy-dedup pipelines all end here:
shingle -> minhash -> band-bucket join -> pair filter -> components ->
keep min-id per component).

Algorithm: iterated hash-to-min label propagation with a pointer-
jumping compression step each round. Labels start at the node id; a
round (a) takes the min label over each node's neighbors, (b) replaces
every label with its label's label. (a) alone converges in
O(diameter) rounds; the (b) compression makes reach distance double
per round, so convergence is O(log n) even on adversarial chain
graphs — the same bound the large-star/small-star MapReduce algorithm
targets. Near-dup clusters in practice are dense (near-cliques), so
2-3 rounds converge.

Scale shape: everything is DataFrame joins/aggregations on (node,
label) long pairs — the documents' text never enters the iteration,
and each round's shuffle carries two longs per edge. The driver sees
only a per-round changed-row COUNT (the convergence test), never row
data. `localCheckpoint` truncates the growing lineage each round so
the plan stays O(1) per iteration instead of O(rounds).

Determinism: labels are min() folds over ids -> the fixpoint is the
min id reachable in the component, independent of join order or
partitioning, which is what lets a recursive-CTE oracle match it
hash-for-hash.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup_text import MINHASH_CAND_CTES, N_HASHES, _minhash_candidates

# keep a candidate pair as a dedup edge when at least half the minhash
# signatures agree (estimated Jaccard >= 0.5)
CLUSTER_MIN_EQ = N_HASHES // 2
_MAX_ROUNDS = 40  # reach doubles per round: 2^40 nodes is beyond any corpus


def connected_components(edges: DataFrame, max_rounds: int = _MAX_ROUNDS) -> DataFrame:
    """Min-label connected components of an undirected edge list
    (columns ``src``, ``dst``, one row per direction). Returns
    (node, label) where label = min node id in the component."""
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # labels only ever DECREASE (min folds), so Σlabel strictly drops
    # until the fixpoint: an unchanged sum IS convergence. One cheap
    # aggregate per round instead of an anti-join traversal. decimal
    # accumulation so billions of long ids cannot overflow the sum.
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_rounds):
        prop = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- label(label). Every label value is
        # itself a node (a min over node ids), so the self-join is total.
        parent = new.select(
            F.col("node").alias("label"), F.col("label").alias("_jump")
        )
        new = (
            new.join(parent, "label")
            .select("node", F.col("_jump").alias("label"))
            .localCheckpoint()  # cut lineage: O(1) plan per round
        )
        new_sum = new.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        labels = new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        edges.unpersist()  # release the cache on the failure path too
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    edges.unpersist()
    return labels


def near_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document cluster assignment over the MinHash near-dup graph:
    (doc_id, cluster_id = min doc in component, is_canonical). Docs
    with no near-dup (no qualifying pair) are not emitted — they are
    trivially canonical."""
    pairs = _minhash_candidates(spark, sf).filter(
        F.col("est_jaccard") >= CLUSTER_MIN_EQ / N_HASHES
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = connected_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.when(F.col("node") == F.col("label"), 1).otherwise(0).cast("int").alias("is_canonical"),
    ).orderBy("doc_id")


NEAR_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {MINHASH_CAND_CTES},
pairs AS (SELECT doc_a, doc_b FROM cand WHERE n_eq >= {CLUSTER_MIN_EQ}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.node = e.src
)
SELECT node AS doc_id,
       min(r) AS cluster_id,
       CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM reach
GROUP BY node
ORDER BY doc_id
"""


QUERIES = {
    "near_dup_clusters": (near_dup_clusters, NEAR_DUP_CLUSTERS_SQL),
}
