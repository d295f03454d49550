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
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """(src, dst) undirected edges -> (id, component) with component =
    min vertex id in the component. Isolated vertices don't appear
    (callers union them back with component = own id).

    Adaptive execution, same principle as the broadcast-join
    threshold: the edge list of a near-dup graph is orders of
    magnitude smaller than the corpus that produced it, and when it
    fits on the driver (<= ``driver_threshold`` edges, ~16 bytes
    each -> ~32 MB at the default) a single-pass union-find beats
    any number of distributed label-propagation rounds — each round
    costs a shuffle + a convergence job regardless of data size.
    Above the threshold, the distributed loop runs; the driver only
    ever sees one scalar per round.

    ``num_partitions`` sizes the per-round shuffles of the
    distributed path: size to ~edges/1e6 on a cluster.
    """
    # edges may be an expensive pipeline (e.g. MinHash-LSH): materialize
    # once — the symmetrization below consumes it twice
    edges = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        out = _union_find_components(edges)
        edges.unpersist()
        return out
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


def _union_find_components(edges: DataFrame) -> DataFrame:
    """Small-graph path: collect (u, v) longs, path-compressed
    union-find on the driver, one createDataFrame back. Output schema
    matches the distributed path: (id, component)."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r.u), find(r.v)
        if ra != rb:
            # min-id root so component == min vertex id, as distributed path
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    out = [(x, find(x)) for x in list(parent)]
    spark = edges.sparkSession
    id_type = dict(edges.dtypes)["u"]
    if not out:
        return spark.createDataFrame([], f"id {id_type}, component {id_type}")
    return spark.createDataFrame(out, f"id {id_type}, component {id_type}")


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
