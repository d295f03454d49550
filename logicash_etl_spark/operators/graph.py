"""Iterative graph operators — connected components for dedup clusters.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep
one canonical doc per component of the similarity graph). Spark has no
recursive CTE, so this is the engine's representative *iterative*
algorithm: driver-driven label propagation over DataFrames.

Algorithm: every vertex starts labeled with its own id; each round,
every vertex takes the min label among itself and its neighbors;
converged when no label changes. Rounds = graph diameter (dedup
components are near-cliques, so 2-3 rounds in practice). Each round is
one shuffle; frames are persisted and the loop checks convergence with
a cheap count — the driver only ever sees ONE scalar per round, never
data.

At 100 TB scale the same loop holds (labels are (long, long) pairs —
the shuffle is tiny relative to the corpus); for adversarial
long-chain graphs switch to the large-star/small-star variant
(alternating min-propagation that converges in O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) undirected edges -> (id, component) with component =
    min vertex id in the component. Isolated vertices don't appear
    (callers union them back with component = own id).

    ``num_partitions`` sizes the per-round shuffles: the label/edge
    frames are usually orders of magnitude smaller than the corpus
    that produced them, so running the loop at the session's default
    partitioning wastes a task-dispatch round-trip per empty
    partition per iteration. Size to ~edges/1e6 on a cluster.
    """
    # edges may be an expensive pipeline (e.g. MinHash-LSH): materialize
    # once — the symmetrization below consumes it twice
    edges = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    if num_partitions:
        sym = sym.repartition(num_partitions, "v")
    sym = sym.persist()
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    # Convergence: labels only ever decrease (min-propagation), so the
    # label sum strictly decreases until fixpoint — one cheap aggregate
    # per round instead of a join-and-compare.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nmin", "component")).alias(
                    "component"
                ),
            )
            .persist()
        )
        cur_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    edges.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Near-dup pairs + the full id universe -> (id, cluster_id,
    is_canonical): every document assigned a cluster (singletons are
    their own), canonical = min id in cluster — the keep-set for
    cluster-level dedup."""
    comps = connected_components(pairs, "id_a", "id_b", num_partitions=num_partitions)
    out = (
        all_ids.select(F.col(id_col).alias("id"))
        .join(comps, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", "id").alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
    return out
