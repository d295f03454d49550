"""Similarity-search queries over the embeddings table.

Brute-force cosine top-k and the kNN label vote have DuckDB oracles
(sequential-fold doubles are bitwise identical across engines — see
tests/test_oracle_parity.py). The LSH ANN variant has no oracle
(xxhash64 hyperplanes); it is recall-tested against brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logicash_etl_spark.operators.similarity import (
    cosine_topk,
    knn_label_vote,
    lsh_ann_topk,
)
from logicash_etl_spark.queries.registry import query
from logicash_etl_spark.sources.readers import read_table

_COSINE_TOPK_SQL = r"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, cosine_sim,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS INT) AS rank
      FROM scored
    )
"""


@query(
    "cosine_topk_bruteforce",
    oracle=_COSINE_TOPK_SQL + "SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 5",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-5 cosine neighbors for the first 10
    vectors. Queries broadcast; corpus streams once; JVM fold dot
    product (bitwise-deterministic doubles)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = cosine_topk(emb, queries, k=5, exclude_self=True)
    return out.withColumn("rank", F.col("rank").cast("int"))


@query(
    "knn_label_vote",
    oracle=_COSINE_TOPK_SQL
    + r"""
    , top5 AS (
      SELECT query_id, vec_id FROM ranked WHERE rank <= 5
    ), votes AS (
      SELECT t.query_id, e.label, count(*) AS votes
      FROM top5 t JOIN embeddings e USING (vec_id)
      GROUP BY t.query_id, e.label
    )
    SELECT query_id, label AS predicted_label, votes FROM (
      SELECT query_id, label, votes,
             row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def knn_label_vote_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification by retrieval: majority label of the top-5
    neighbors."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    top5 = cosine_topk(emb, queries, k=5, exclude_self=True)
    return knn_label_vote(top5, emb)


@query(
    "embedding_dup_pairs",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
      FROM embeddings
    )
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.e, b.e) / (a.n * b.n) AS cosine_sim
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.4
    """,
)
def embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold):
    the semantic-dedup primitive. Pairs are generated within a coarse
    blocking key (here the label column) and scored exactly — the
    IVF-style shape: a coarse partitioner bounds the quadratic blow-up
    to within-block pairs, the equi-join on the block key shuffles
    instead of cross-joining. At 100 TB the block key comes from LSH
    buckets or a k-means coarse quantizer; scoring is unchanged."""
    from logicash_etl_spark.operators.partitioning import scale_out
    from logicash_etl_spark.operators.similarity import _dot, _norm, as_double

    emb = read_table(spark, sf_dir, "embeddings")
    # norms once per vector (N folds), not once per pair (3x N^2 folds);
    # scale_out so the folds don't run on the scan's single split
    v = scale_out(emb.select("label", "vec_id", "embedding")).select(
        "label", "vec_id", as_double("embedding").alias("__v"),
        _norm(as_double("embedding")).alias("__n"),
    )
    # distinct alias per side: a.label == b.label on two selects of the
    # SAME lineage resolves both to one attribute and Catalyst drops
    # the equality as trivially true — turning the blocked join into a
    # full cross join (the "Constructing trivially true equals
    # predicate" warning)
    a = v.select(F.col("label").alias("label"), F.col("vec_id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na"))
    b = v.select(F.col("label").alias("__label_b"), F.col("vec_id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb"))
    pairs = a.join(b, on=[F.col("label") == F.col("__label_b"), F.col("id_a") < F.col("id_b")]).select(
        "label", "id_a", "id_b",
        (_dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias("cosine_sim"),
    )
    return pairs.filter(F.col("cosine_sim") >= 0.4)


@query("ann_lsh_topk")  # xxhash64 hyperplanes: no SQL oracle; recall-tested
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-probe random-hyperplane LSH
    (8 tables x 4 planes, 2 least-confident-bit probes per table,
    recall@5 ~0.96 here — beats 16 single-probe tables at HALF the
    corpus-side index) with exact cosine re-rank on the candidate
    union — the scale path when Q ~ N and brute force is O(N^2)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = lsh_ann_topk(emb, queries, dim=64, planes=4, tables=8, k=5, multi_probe=2)
    return out


@query("ivf_ann_topk")  # iterative k-means quantizer: rows-only; recall-tested
def ivf_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer (lowest-id
    init, Lloyd iterations as scan+groupBy rounds), inverted-file
    cells, n_probe nearest cells exact-re-ranked per query. The other
    classic ANN scale path beside LSH: candidate fraction ~ n_probe/k,
    and the cell assignment doubles as the blocking key for
    embedding dedup (cf. embedding_dup_pairs)."""
    from logicash_etl_spark.operators.similarity import ivf_ann_topk, kmeans_lite

    emb = read_table(spark, sf_dir, "embeddings")
    # 8k training rows bound the driver pull; FAISS practice is
    # ~256 samples per centroid, so 8k >> enough for k=8
    centroids = kmeans_lite(emb, k=8, iterations=2, train_sample=8192)
    queries = emb.filter(F.col("vec_id") < 10)
    # 10-query batch vs the whole corpus: broadcast the probed query
    # side so the 8-distinct-value cell join never shuffles the corpus
    return ivf_ann_topk(emb, queries, centroids, k=5, n_probe=3, broadcast_queries=True)


@query("semantic_dedup_stats")  # k-means quantizer: rows-only; exact-twin tested
def semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end (Abbas et al. 2023): deterministic k-means
    cells as the semantic blocking key, exact cosine within cells,
    greedy keep-lowest-id removal, rolled up per cell. The embedding
    near-dup pruning a 100 TB pretraining corpus runs AFTER exact/
    MinHash text dedup — catches paraphrases exact hashing can't.
    No SQL oracle (iterative quantizer); tests/test_similarity.py
    re-derives assignment, pairs, and removals in numpy and asserts
    equality, and the property tests pin the keep-policy invariants."""
    from logicash_etl_spark.operators.similarity import kmeans_lite, semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = kmeans_lite(emb, k=8, iterations=2, train_sample=8192)
    marked = semantic_dedup(emb, centroids, threshold=0.4)
    return (
        marked.groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("removed").cast("long")).alias("n_removed"),
            F.sum((~F.col("removed")).cast("long")).alias("n_kept"),
        )
        .withColumn(
            "retention",
            F.round(F.col("n_kept").cast("double") / F.col("n_vecs"), 6),
        )
    )
