"""Curation extensions: the decision layer on top of the dedup
primitives — which doc do we KEEP, what happens when a new lot lands
on an existing corpus, and how do we spend a token budget.

These are the shapes a pretraining-data pipeline runs daily on top of
the pair/fingerprint machinery (operators/dedup.py,
queries/similarity.py): pairs are evidence; these queries are the
verdicts. All three are pure DataFrame compositions with exact DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from logicash_etl_spark.operators.text import tokens
from logicash_etl_spark.queries.dedup import _pair_lot
from logicash_etl_spark.queries.registry import query
from logicash_etl_spark.queries.similarity import embedding_dup_pairs
from logicash_etl_spark.sources.readers import read_table

_PAIRS_CTE = """
    v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS n
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.4
    )
"""


@query(
    "near_dup_keep_decisions",
    oracle=f"""
    WITH {_PAIRS_CTE},
    partners AS (
      SELECT vec_id, CAST(count(*) AS BIGINT) AS n_partners FROM (
        SELECT id_a AS vec_id FROM pairs
        UNION ALL
        SELECT id_b AS vec_id FROM pairs
      ) GROUP BY vec_id
    )
    SELECT e.vec_id, e.label,
           COALESCE(p.n_partners, 0) AS n_partners,
           e.vec_id NOT IN (SELECT id_b FROM pairs) AS keep
    FROM embeddings e LEFT JOIN partners p ON e.vec_id = p.vec_id
    """,
)
def near_dup_keep_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup VERDICT pass: given the near-dup pair evidence
    (embedding_dup_pairs: label-blocked exact cosine >= 0.4), decide
    keep/remove per item with the greedy lowest-id-keeps rule — an
    item is removed iff some lower-id item is near-duplicate to it
    (it appears as the larger side of any pair). Deterministic,
    single-pass, and — unlike full connected-components — needs no
    iteration: exactly the SemDeDup-style keep-one-per-neighborhood
    policy. Pairs are ~corpus-sparse, so the partner counts and the
    removal list are small aggregates joined back to the corpus; the
    corpus itself is scanned once."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # the pair evidence is the expensive part (blocked self-join);
    # materialize it once per (process, sf_dir) — three downstream
    # branches (partner counts, removal list) read the small lot
    # instead of re-running the join per branch
    pairs = _pair_lot(
        spark,
        sf_dir,
        "embedding_cos_pairs",
        lambda: embedding_dup_pairs(spark, sf_dir).select("id_a", "id_b"),
    )
    partners = (
        pairs.select(F.col("id_a").alias("vec_id"))
        .unionAll(pairs.select(F.col("id_b").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_partners"))
    )
    removed = pairs.select(F.col("id_b").alias("__rm")).distinct()
    return (
        emb.join(partners, "vec_id", "left")
        .join(removed, emb.vec_id == F.col("__rm"), "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("n_partners", F.lit(0)).alias("n_partners"),
            F.col("__rm").isNull().alias("keep"),
        )
    )


@query(
    "incremental_lot_dedup",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 10 < 8
    ), newlot AS (
      SELECT doc_id, source, md5(text) AS fp
      FROM documents WHERE doc_id % 10 >= 8
    ), ranked AS (
      SELECT doc_id, source, fp,
             min(doc_id) OVER (PARTITION BY fp) AS first_id
      FROM newlot
    )
    SELECT doc_id, source,
           CASE WHEN fp IN (SELECT fp FROM hist) THEN 'dup_of_history'
                WHEN doc_id > first_id THEN 'dup_in_lot'
                ELSE 'new_unique' END AS status
    FROM ranked
    """,
)
def incremental_lot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a freshly landed lot (doc_id%10>=8 as
    the arrival split) is checked against the historical fingerprint
    store AND within itself in one pass — the every-night shape of a
    growing corpus, where re-fingerprinting history would be O(corpus)
    per lot. Status per new doc: dup_of_history (fingerprint already
    stored), dup_in_lot (a lower-id lot-mate shares it), new_unique.

    100 TB plan: history is touched only through its DISTINCT
    fingerprint column (a compact store, bucketable by fp); the lot
    shuffles once on fp for the within-lot window and joins the
    history fingerprints on the same key. The corpus text is never
    re-read."""
    docs = read_table(spark, sf_dir, "documents")
    hist_fp = (
        docs.filter(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("fp"))
        .distinct()
        .withColumn("__in_hist", F.lit(True))
    )
    newlot = docs.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    first = F.min("doc_id").over(W.partitionBy("fp"))
    return (
        newlot.withColumn("first_id", first)
        .join(hist_fp, "fp", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("__in_hist"), "dup_of_history")
            .when(F.col("doc_id") > F.col("first_id"), "dup_in_lot")
            .otherwise("new_unique")
            .alias("status"),
        )
    )


@query(
    "token_budget_sample",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(COALESCE(len(list_filter(string_split_regex(trim(text),
                                                              '\s+'),
                                           x -> x <> '')), 0)
                  AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY n_tokens DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= 800
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: per source, greedily admit documents
    (longest-first, doc_id tie-break) until an 800-token budget is
    spent — the how-much-of-each-domain-fits cut every mixture build
    makes after the weights are chosen (cf. domain_mixture_weights).
    The running sum is ``grouped_prefix_sum`` (range-bucketed windows
    WITHIN each source — the de-skewed scan mixture_build_plan uses),
    so a dominant source never lands its whole doc set on one
    reducer; the token count is computed in the same pass as the
    scan (no second read).

    NULL-text posture (r12 [contract] decision): COUNTS 0 — a NULL
    document is admitted like an empty one, consuming no budget
    (the sequence_packing_stats precedent); the oracle COALESCEs
    identically. The per-doc count frame is persisted: the prefix
    sum's internal consumers (range stats, local window, bucket
    offsets) otherwise re-tokenized the corpus per consumer (4
    executed documents scans, audited r10)."""
    from logicash_etl_spark.operators.caching import scoped_persist
    from logicash_etl_spark.operators.partitioning import grouped_prefix_sum

    docs = read_table(spark, sf_dir, "documents")
    toks = scoped_persist(
        docs.select(
            "doc_id",
            "source",
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(F.size(tokens("text")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    return (
        grouped_prefix_sum(
            toks.withColumn("__nk", -F.col("n_tokens")),
            group_col="source",
            bucket_key="__nk",
            order_cols=[F.col("n_tokens").desc(), F.col("doc_id")],
            value_col="n_tokens",
            out_col="cum_tokens",
            inclusive=True,
        ).drop("__nk")
        .filter(F.col("cum_tokens") <= 800)
    )


def _bpe_budget_oracle() -> str:
    from logicash_etl_spark.queries.pipeline_ops import _bpe_train_ctes

    return (
        _bpe_train_ctes(8)
        + r""",
    wlen AS (
      SELECT w, CAST(len(string_split(trim(s, chr(10)), chr(10)||chr(10)))
                 AS BIGINT) AS n_sym
      FROM v8
    ), docw AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ), toks AS (
      SELECT d.doc_id, d.source,
             CAST(COALESCE(p.n_bpe, 0) AS BIGINT) AS n_tokens
      FROM documents d
      LEFT JOIN (SELECT dw.doc_id, SUM(wl.n_sym) AS n_bpe
                 FROM docw dw JOIN wlen wl ON dw.w = wl.w
                 GROUP BY dw.doc_id) p USING (doc_id)
    ), cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY n_tokens DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= 4000
    """
    )


@query("token_budget_sample_bpe", oracle=_bpe_budget_oracle())
def token_budget_sample_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget admission on REAL tokenizer counts: the same
    longest-first-per-source greedy cut as ``token_budget_sample``,
    but budgeted in BPE tokens from a merge table trained on the
    corpus (operators/text.bpe_train + bpe_encode) instead of the
    whitespace proxy — the shape a production mixture build runs once
    a tokenizer exists. Encoding stays vocabulary-bounded (the
    distinct-word frame is encoded once; per-doc counts come from one
    hash join + sum), so the budget pass costs one corpus explode +
    one window, same as the proxy version. Budget 4000: BPE-8 symbol
    counts run ~5x whitespace counts on this corpus (char-level start,
    8 merges learned).

    Oracle: the SQL-trained merge stages (shared with
    bpe_merges_report) + the same join and window, end to end."""
    from logicash_etl_spark.operators.text import bpe_encode, bpe_train

    from logicash_etl_spark.operators.caching import scoped_persist

    docs = read_table(spark, sf_dir, "documents")
    # wc is vocabulary-bounded and feeds BOTH the iterative BPE
    # trainer and the per-word encode; toks feeds the prefix-sum
    # scan's several internal consumers. Unpersisted, the corpus
    # explode re-ran per consumer (8 executed documents scans —
    # audited r9); persisted, documents is read twice (vocab pass +
    # per-doc pass), the minimum for this shape.
    wc = scoped_persist(
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    merges = bpe_train(wc, n_merges=8)
    wlen = wc.select(
        "word",
        F.size(bpe_encode(F.col("word"), merges)).cast("bigint").alias("__n_sym"),
    )
    toks = scoped_persist(
        docs.select(
            "doc_id", "source", F.explode_outer(tokens("text")).alias("word")
        )
        .join(wlen, "word", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.coalesce(F.sum("__n_sym"), F.lit(0)).cast("bigint").alias("n_tokens")
        )
    )
    from logicash_etl_spark.operators.partitioning import grouped_prefix_sum

    return (
        grouped_prefix_sum(
            toks.withColumn("__nk", -F.col("n_tokens")),
            group_col="source",
            bucket_key="__nk",
            order_cols=[F.col("n_tokens").desc(), F.col("doc_id")],
            value_col="n_tokens",
            out_col="cum_tokens",
            inclusive=True,
        )
        .drop("__nk")
        .filter(F.col("cum_tokens") <= 4000)
    )


@query(
    "token_balanced_shards",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS start_tok
      FROM toks
    )
    SELECT CAST(start_tok // 2000 AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM cum
    GROUP BY 1
    """,
)
def token_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced training-shard assignment: docs in stable
    doc_id order are cut into ~2000-token shards by each doc's
    STARTING token offset — the writer layout step before
    ``write.partitionBy(shard)``, sized so every output file carries
    the same token load (sequence-packing's file-level sibling).

    The global running offset comes from
    :func:`~logicash_etl_spark.operators.partitioning.global_prefix_sum`
    — a two-pass bucketed scan, NOT a single-partition global window:
    the only full-data shuffle is into deterministic doc_id range
    buckets; bucket totals (32 numbers) prefix-sum on the driver and
    re-enter as a broadcast offset join. The oracle is the plain SQL
    cumsum window, so the distributed prefix sum gets a hash-exact
    signal."""
    from logicash_etl_spark.operators.partitioning import global_prefix_sum

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tokens")
    )
    cum = global_prefix_sum(
        toks, order_col="doc_id", value_col="n_tokens", out_col="start_tok"
    )
    return (
        cum.withColumn("shard_id", (F.col("start_tok") / 2000).cast("bigint"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "temperature_resample_counts",
    oracle="""
    WITH stats AS (
      SELECT lang, count(*) AS n_total,
             CAST(round(sqrt(count(*)), 9) AS DECIMAL(18,9)) AS s_dec
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n_total) AS n_all, SUM(s_dec) AS s_all FROM stats
    ), p AS (
      SELECT lang, n_total,
             least(1.0, ((0.5 * n_all) * (CAST(s_dec AS DOUBLE)
                         / CAST(s_all AS DOUBLE))) / n_total) AS pk
      FROM stats, tot
    ), tagged AS (
      SELECT lang,
             CAST(CAST(('0x' || substr(md5('temp' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM documents
    ), kept AS (
      SELECT t.lang, count(*) AS n_kept
      FROM tagged t JOIN p USING (lang)
      WHERE u < pk GROUP BY t.lang
    )
    SELECT p.lang, n_total, round(pk, 6) AS p_keep,
           COALESCE(n_kept, 0) AS n_kept
    FROM p LEFT JOIN kept USING (lang)
    """,
)
def temperature_resample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (the UniMax / data-mixture
    primitive): per-language keep probability proportional to
    n_lang^0.5 — alpha=0.5 flattens the head (en) and upweights the
    tail — scaled to a half-corpus token budget and capped at 1.
    Membership is the md5 content-hash draw (operators/sampling.py),
    so the SAME docs are kept on any cluster size or engine.

    Bitwise-reproducible across engines by construction: sqrt is
    IEEE-exact, the cross-language normalizer sums DECIMAL(18,9)
    (order-free), and the probability formula is parenthesized
    identically here and in the oracle — the draw comparison then has
    one well-defined double on each side."""
    from logicash_etl_spark.operators.sampling import _u

    docs = read_table(spark, sf_dir, "documents")
    stats = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_total"))
        .withColumn("s_dec", F.round(F.sqrt("n_total"), 9).cast("decimal(18,9)"))
    )
    from logicash_etl_spark.operators.caching import scoped_persist

    # stats and p are |langs|-row frames feeding two consumers each;
    # unpersisted, the corpus rollup re-ran per consumer (5 executed
    # documents scans — audited r9). Persisted: two scans (rollup +
    # admission pass), the minimum for this shape.
    stats = scoped_persist(stats)
    tot = stats.agg(
        F.sum("n_total").alias("n_all"), F.sum("s_dec").alias("s_all")
    )
    p = scoped_persist(stats.crossJoin(F.broadcast(tot))).select(
        "lang",
        "n_total",
        F.least(
            F.lit(1.0),
            (
                (F.lit(0.5) * F.col("n_all"))
                * (F.col("s_dec").cast("double") / F.col("s_all").cast("double"))
            )
            / F.col("n_total"),
        ).alias("pk"),
    )
    kept = (
        docs.join(F.broadcast(p), on="lang")
        .filter(_u(F.col("doc_id"), "temp") < F.col("pk"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return p.join(kept, on="lang", how="left").select(
        "lang",
        "n_total",
        F.round("pk", 6).alias("p_keep"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


@query(
    "mixture_build_plan",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(COALESCE(len(list_filter(string_split_regex(trim(text),
                                                              '\s+'),
                                           x -> x <> '')), 0)
                  AS BIGINT) AS n_tokens
      FROM documents
    ), stats AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs_total,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
             CAST(round(sqrt(CAST(SUM(n_tokens) AS DOUBLE)), 9)
                  AS DECIMAL(18,9)) AS s_dec
      FROM toks GROUP BY source
    ), tot AS (
      SELECT SUM(s_dec) AS s_all FROM stats
    ), budgets AS (
      SELECT source, n_docs_total, n_tokens_total,
             CAST(s_dec AS DOUBLE) / CAST(s_all AS DOUBLE) AS w,
             CAST(floor((CAST(s_dec AS DOUBLE) / CAST(s_all AS DOUBLE))
                        * 20000) AS BIGINT) AS budget_tokens
      FROM stats, tot
    ), cum AS (
      SELECT t.doc_id, t.source, t.n_tokens,
             CAST(SUM(t.n_tokens) OVER (PARTITION BY t.source
                    ORDER BY t.n_tokens DESC, t.doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM toks t
    ), admitted AS (
      SELECT c.source,
             CAST(count(*) AS BIGINT) AS n_admitted,
             CAST(SUM(c.n_tokens) AS BIGINT) AS tokens_admitted
      FROM cum c JOIN budgets b ON c.source = b.source
      WHERE c.cum_tokens <= b.budget_tokens
      GROUP BY c.source
    )
    SELECT b.source, b.n_docs_total, b.n_tokens_total,
           round(b.w, 6) AS weight, b.budget_tokens,
           CAST(COALESCE(a.n_admitted, 0) AS BIGINT) AS n_admitted,
           CAST(COALESCE(a.tokens_admitted, 0) AS BIGINT) AS tokens_admitted,
           round(CAST(COALESCE(a.tokens_admitted, 0) AS DOUBLE)
                 / b.budget_tokens, 6) AS utilization
    FROM budgets b LEFT JOIN admitted a USING (source)
    """,
)
def mixture_build_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture build END TO END, composed from the catalog's
    pieces in one plan: per-source sqrt-temperature weights (the
    UniMax-style head flattening of domain_mixture_weights), a
    20k-token global budget split by weight, and greedy longest-first
    admission per source against its budget slice (token_budget_sample's
    cut) — the one-query version of "given these domains, what goes in
    the next training mix".

    Cross-source weight normalization sums DECIMAL(18,9)-rounded
    sqrts (exact, order-independent — the temperature_resample_counts
    trick), so the doubles that reach round(·,6) are bitwise
    reproducible. Plan shape: one corpus scan for token counts, a
    5-row stats aggregate broadcast back, and the admission cumsum via
    ``grouped_prefix_sum`` (operators/partitioning.py) — range-bucketed
    windows WITHIN each source, never a per-source single-reducer
    window: at 100 TB the dominant source (web crawl is always the
    head domain) would otherwise sort most of the corpus on one task.
    Plan-pinned in tests/test_plan_contracts.py."""
    from logicash_etl_spark.operators.caching import scoped_persist

    # toks feeds the stats rollup AND the admission prefix-sum scan
    # (several internal consumers); budgets feeds admission and the
    # final join. Unpersisted, the corpus was re-tokenized per
    # consumer (8 executed documents scans — audited r9); persisting
    # the per-doc count frame (3 narrow columns, no text) and the
    # |sources|-row budget frame makes it ONE corpus scan.
    # NULL-text posture (r12 [contract] decision): COUNTS 0 — same
    # contract as token_budget_sample; the oracle COALESCEs too.
    toks = scoped_persist(
        read_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(F.size(tokens("text")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    stats = toks.groupBy("source").agg(
        F.count("*").alias("n_docs_total"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.round(F.sqrt(F.sum("n_tokens").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("s_dec"),
    )
    tot = stats.agg(F.sum("s_dec").alias("s_all"))
    budgets = scoped_persist(stats.crossJoin(F.broadcast(tot))).select(
        "source",
        "n_docs_total",
        "n_tokens_total",
        (F.col("s_dec").cast("double") / F.col("s_all").cast("double")).alias("w"),
        F.floor(
            (F.col("s_dec").cast("double") / F.col("s_all").cast("double"))
            * 20000
        )
        .cast("bigint")
        .alias("budget_tokens"),
    )
    from logicash_etl_spark.operators.partitioning import grouped_prefix_sum

    cum = grouped_prefix_sum(
        toks.withColumn("__nk", -F.col("n_tokens")),
        group_col="source",
        bucket_key="__nk",
        order_cols=[F.col("n_tokens").desc(), F.col("doc_id")],
        value_col="n_tokens",
        out_col="cum_tokens",
        inclusive=True,
    ).drop("__nk")
    admitted = (
        cum.join(F.broadcast(budgets.select("source", "budget_tokens")), "source")
        .filter(F.col("cum_tokens") <= F.col("budget_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_admitted"),
            F.sum("n_tokens").alias("tokens_admitted"),
        )
    )
    return budgets.join(admitted, "source", "left").select(
        "source",
        "n_docs_total",
        "n_tokens_total",
        F.round("w", 6).alias("weight"),
        "budget_tokens",
        F.coalesce("n_admitted", F.lit(0)).cast("bigint").alias("n_admitted"),
        F.coalesce("tokens_admitted", F.lit(0)).cast("bigint").alias("tokens_admitted"),
        F.round(
            F.coalesce("tokens_admitted", F.lit(0)).cast("double")
            / F.col("budget_tokens"),
            6,
        ).alias("utilization"),
    )


@query(
    "weighted_sample_topk",
    oracle="""
    WITH d AS (
      SELECT source, doc_id, n_chars,
             CAST(CAST(('0x' || substr(md5('wsample' ||
                    CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
                 / 4294967296.0 AS u
      FROM documents WHERE n_chars > 0
    ), k AS (
      SELECT source, doc_id, -ln(u) / n_chars AS ekey
      FROM d WHERE u > 0
    ), r AS (
      SELECT source, doc_id,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY ekey ASC, doc_id ASC
             ) AS INT) AS rk
      FROM k
    )
    SELECT source, doc_id, rk FROM r WHERE rk <= 5
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 5 docs per source,
    P(pick) proportional to document length — the Efraimidis-Spirakis
    exponential-key scheme (operators/sampling.py:weighted_topk_sample).
    This is how a curation pipeline draws "1M docs biased toward
    long/high-quality" reproducibly: the draw is a content hash, so
    the sample survives repartitioning, cluster resizes, and engine
    swaps (the oracle reproduces it bit-for-bit in DuckDB). One
    hash + one per-group window — no global sort, no driver state;
    at 100 TB the window partitions by source (thousands of groups),
    never globally. Extends the reference's sampling surface
    (data_gen/generator.py:106-175 draws weighted categoricals at
    generation time; here the engine samples at curation time)."""
    from logicash_etl_spark.operators.sampling import weighted_topk_sample

    docs = read_table(spark, sf_dir, "documents")
    out = weighted_topk_sample(
        docs, id_col="doc_id", weight_col="n_chars",
        group_col="source", k=5,
    )
    return out.select("source", "doc_id", F.col("rk").cast("int").alias("rk"))


@query(
    "bloom_history_dedup",
    oracle=r"""
    WITH fps AS (
      -- NULL text fingerprints as empty text (md5('')) — the dedup
      -- family contract (cf. streaming_incremental_dedup): every doc
      -- gets a non-null fp, so no row ever silently drops out of the
      -- ingest decision report
      -- outer COALESCE: DuckDB array_to_string([]) is NULL where
      -- Spark array_join([]) is '' — the empty-lead fingerprint must
      -- be md5('') on both engines
      SELECT doc_id, source,
             md5(COALESCE(array_to_string(
               (list_filter(string_split_regex(trim(lower(COALESCE(text, ''))), '\s+'),
                            x -> x <> ''))[1:8], ' '), '')) AS fp
      FROM documents
    ), hist AS (
      SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8
    ), hsh AS (
      SELECT fp,
        CAST(('0x' || substr(md5('bf' || fp), 1, 8)) AS BIGINT) AS h1,
        CAST(('0x' || substr(md5('bf' || fp), 9, 8)) AS BIGINT) AS h2
      FROM hist
    ), bitmap AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM (SELECT (h1 + i * h2) % 4096 AS pos
            FROM hsh, (VALUES (0), (1), (2)) t(i))
      GROUP BY word
    ), incoming AS (
      SELECT doc_id, source, fp FROM fps WHERE doc_id % 10 >= 8
    ), phsh AS (
      SELECT DISTINCT fp,
        CAST(('0x' || substr(md5('bf' || fp), 1, 8)) AS BIGINT) AS h1,
        CAST(('0x' || substr(md5('bf' || fp), 9, 8)) AS BIGINT) AS h2
      FROM incoming
    ), hits AS (
      SELECT p.fp,
             COALESCE(((b.bits >> CAST(p.pos % 32 AS INT)) & 1) = 1, FALSE)
               AS hit
      FROM (SELECT fp, (h1 + i * h2) % 4096 AS pos
            FROM phsh, (VALUES (0), (1), (2)) t(i)) p
      LEFT JOIN bitmap b ON b.word = p.pos // 32
    ), verdict AS (
      SELECT fp, (SUM(CASE WHEN hit THEN 1 ELSE 0 END) = 3) AS bloom_pass
      FROM hits GROUP BY fp
    )
    SELECT i.doc_id, i.source,
           CASE WHEN NOT v.bloom_pass THEN 'new_fast_path'
                WHEN h.fp IS NOT NULL THEN 'dup_of_history'
                ELSE 'new_after_check' END AS status
    FROM incoming i
      JOIN verdict v ON v.fp = i.fp
      LEFT JOIN hist h ON h.fp = i.fp
    """,
)
def bloom_history_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated incremental dedup — the runtime filter's
    highest-value curation use. A 100 TB corpus's fingerprint store is
    huge; joining every incoming lot against it is the dominant dedup
    cost. A Bloom filter over the store (kilobytes, broadcast) gives
    each incoming doc a free verdict: ``bloom_pass = False`` is
    DEFINITIVELY new — no join needed (``new_fast_path``, the
    majority for fresh crawl data); only bloom survivors pay the
    exact store join, which also unmasks the filter's false positives
    (``new_after_check`` vs ``dup_of_history``). No false negatives
    by construction, so no dup ever slips through the fast path —
    the oracle rebuilds the identical md5 bitmap in SQL and the
    driver hash-checks every per-doc status, fast path included.

    The plan REALIZES the pruning it advertises: the probe is the
    row-level broadcast-literal bitmap evaluation
    (operators/joins.py:bloom_filter_probe_literal — zero shuffle,
    zero join; fingerprints are ~unique per row, so the key-level
    probe's distinct + verdict join-back would be two wasted full
    shuffles), and the frame is SPLIT on the verdict before the
    store join: ``bloom_pass = False`` rows take a join-free branch
    straight to ``new_fast_path``, and ONLY survivors are joined
    against the history store (plan-pinned in
    tests/test_plan_contracts.py::test_bloom_history_dedup_plan).
    The fingerprint is the LEAD fingerprint (md5 of the first 8
    tokens): docs sharing an identical opening are overwhelmingly
    boilerplate or re-crawls, so it catches dups full-text md5
    misses while staying exact-comparable in SQL."""
    from logicash_etl_spark.operators.joins import (
        bloom_filter_build,
        bloom_filter_probe_literal,
    )
    from logicash_etl_spark.operators.text import tokens

    from logicash_etl_spark.operators.caching import scoped_persist

    m_bits, k = 4096, 3
    # NULL text fingerprints as empty text: COALESCE before tokenize,
    # mirroring the oracle — md5 of a NULL lead would make the row
    # vanish from the verdict join on one engine and fast-path on the
    # other. The per-doc fingerprint frame (3 narrow cols) is
    # persisted: history build, the literal probe's bitmap collect,
    # and the survivor store join all derive from it, so the text
    # scan executes once instead of three times
    docs = scoped_persist(
        read_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.md5(
                F.array_join(
                    F.slice(
                        tokens(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                        1,
                        8,
                    ),
                    " ",
                )
            ).alias("fp"),
        )
    )
    hist = docs.filter(F.col("doc_id") % 10 < 8).select("fp").distinct()
    incoming = docs.filter(F.col("doc_id") % 10 >= 8)
    bloom = bloom_filter_build(hist, "fp", m_bits=m_bits, k_hashes=k)
    probed = bloom_filter_probe_literal(
        incoming, "fp", bloom, m_bits=m_bits, k_hashes=k
    )
    # fast path: definitively-new rows never touch the history store
    fast = probed.filter(~F.col("bloom_pass")).select(
        "doc_id", "source", F.lit("new_fast_path").alias("status")
    )
    # only bloom survivors pay the (large) history-store join
    checked = (
        probed.filter(F.col("bloom_pass"))
        .join(hist.withColumn("__in_hist", F.lit(True)), on="fp", how="left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("__in_hist"), "dup_of_history")
            .otherwise("new_after_check")
            .alias("status"),
        )
    )
    return fast.unionByName(checked)


@query(
    "curation_funnel_report",
    oracle=r"""
    WITH feat AS (
      SELECT doc_id, text,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '')) AS BIGINT) AS n_tokens,
        length(text) AS nc,
        len(regexp_extract_all(text, '[0-9]')) AS nd,
        len(regexp_extract_all(text, '\s')) AS nsp
      FROM documents
    ), q AS (
      SELECT doc_id, text, n_tokens FROM feat
      WHERE n_tokens >= 10
        AND (CASE WHEN n_tokens > 0
                  THEN CAST(nc - nsp AS DOUBLE) / n_tokens
                  ELSE 0.0 END) <= 12.0
        AND CAST(nd AS DOUBLE) / greatest(nc, 1) <= 0.3
    ), e AS (
      SELECT q.doc_id, q.text, q.n_tokens FROM q
      JOIN (
        SELECT min(doc_id) AS doc_id FROM (
          SELECT doc_id,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
          FROM q)
        GROUP BY h
      ) k USING (doc_id)
    ), w2 AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ), sh2 AS (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                    THEN list_transform(generate_series(1, len(ws) - 2),
                                        i -> array_to_string(ws[i:i+2], ' '))
                    ELSE [] END)) AS s
      FROM w2
    ), sizes2 AS (
      SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id
    ), idx2 AS (
      SELECT doc_id, s FROM sh2
      WHERE s NOT IN (SELECT s FROM sh2 GROUP BY s HAVING count(*) > 100)
    ), cand2 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM idx2 a JOIN idx2 b ON a.s = b.s AND a.doc_id < b.doc_id
    ), inter2 AS (
      SELECT c.id_a, c.id_b, count(*) AS n
      FROM cand2 c
        JOIN sh2 a ON a.doc_id = c.id_a
        JOIN sh2 b ON b.doc_id = c.id_b AND b.s = a.s
      GROUP BY c.id_a, c.id_b
    ), dropids AS (
      SELECT DISTINCT i.id_b AS doc_id
      FROM inter2 i
        JOIN sizes2 sa ON sa.doc_id = i.id_a
        JOIN sizes2 sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n) >= 0.35
        AND i.id_a IN (SELECT doc_id FROM e)
        AND i.id_b IN (SELECT doc_id FROM e)
    ), nd_surv AS (
      SELECT e.doc_id, e.n_tokens FROM e
      LEFT JOIN dropids d ON d.doc_id = e.doc_id
      WHERE d.doc_id IS NULL
    ), cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
      FROM nd_surv
    ), adm AS (
      SELECT doc_id, n_tokens FROM cum WHERE ct <= 50000
    )
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'ingest' AS stage,
             CAST(count(*) AS BIGINT) AS docs_out,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_out FROM feat
      UNION ALL
      SELECT 2, 'quality_gate', CAST(count(*) AS BIGINT),
             CAST(SUM(n_tokens) AS BIGINT) FROM q
      UNION ALL
      SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT),
             CAST(SUM(n_tokens) AS BIGINT) FROM e
      UNION ALL
      SELECT 4, 'near_dup', CAST(count(*) AS BIGINT),
             CAST(SUM(n_tokens) AS BIGINT) FROM nd_surv
      UNION ALL
      SELECT 5, 'token_budget', CAST(count(*) AS BIGINT),
             CAST(SUM(n_tokens) AS BIGINT) FROM adm
    )
    """,
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END TO END as one accounted funnel —
    the showpiece composition a corpus team actually ships: ingest →
    Gopher quality gate → exact dedup (md5 keep-min) → near-dup drop
    (exact 3-gram Jaccard >= 0.35 against a LOWER-id survivor;
    pairwise keep-earliest, deliberately not transitive closure —
    dedup_clusters covers that) → greedy longest-first token-budget
    admission (50k), with (docs, tokens) surviving each stage. Every
    stage is the library operator the catalog already proves
    (quality_features/quality_flag, exact_dedup via content_hash,
    the shared exact-Jaccard pair lot, grouped_prefix_sum for
    the admission cumsum — bucketed, no single-reducer sort), so the
    funnel doubles as an integration test of their composition, and
    the oracle recomputes all five stages in SQL so the driver hash
    pins the whole pipeline's arithmetic. At 100 TB each stage is the
    operator's own documented plan; the funnel adds only 5 count
    rows."""
    from logicash_etl_spark.operators.caching import scoped_persist
    from logicash_etl_spark.operators.dedup import exact_dedup
    from logicash_etl_spark.operators.partitioning import grouped_prefix_sum
    from logicash_etl_spark.operators.text import (
        quality_features,
        quality_flag,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # r14: ONE tokenize pass for stages 1 AND 2 — the old shape ran a
    # separate `feat` scan computing token_count over the whole corpus
    # just for the ingest row, then quality_features tokenized the
    # corpus AGAIN for the gate. The persisted frame keeps text bytes
    # ONLY for gate survivors (NULLed otherwise), so the cache holds
    # exactly what the old post-filter persist held plus a narrow
    # (doc_id, n_tokens, flag) row per dropped doc — dropped docs'
    # text is never cached, preserving the old memory posture.
    qa = scoped_persist(
        quality_flag(quality_features(docs)).select(
            "doc_id",
            F.when(F.col("quality_keep"), F.col("text")).alias("text"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "quality_keep",
        )
    )
    q = qa.filter(F.col("quality_keep")).select("doc_id", "text", "n_tokens")
    e = scoped_persist(exact_dedup(q, "doc_id", "text"))
    # near-dup evidence comes from the corpus-wide exact-Jaccard pair
    # lot (shared + materialized once per process — the same evidence
    # ngram_jaccard_dups/dedup_clusters read), restricted to pairs
    # whose BOTH endpoints survived the earlier stages: a survivor
    # drops iff a lower-id survivor is near-duplicate to it
    from logicash_etl_spark.queries.dedup import _exact_pairs

    surv_ids = e.select("doc_id")
    pairs = _exact_pairs(spark, sf_dir)
    drops = (
        pairs.join(
            surv_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
        )
        .join(
            surv_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi"
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    nd = scoped_persist(e.join(drops, "doc_id", "left_anti"))
    adm = grouped_prefix_sum(
        nd.withColumn("__g", F.lit(1)).withColumn("__nk", -F.col("n_tokens")),
        group_col="__g",
        bucket_key="__nk",
        order_cols=[F.col("n_tokens").desc(), F.col("doc_id")],
        value_col="n_tokens",
        out_col="ct",
        inclusive=True,
    ).filter(F.col("ct") <= 50000)

    def stage(idx: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("bigint").alias("docs_out"),
            F.sum("n_tokens").cast("bigint").alias("tokens_out"),
        )

    return (
        stage(1, "ingest", qa)
        .unionByName(stage(2, "quality_gate", q))
        .unionByName(stage(3, "exact_dedup", e))
        .unionByName(stage(4, "near_dup", nd))
        .unionByName(stage(5, "token_budget", adm))
    )


@query(
    "dsir_importance_weights",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ), uni AS (
      SELECT doc_id, source, unnest(ws) AS f FROM w
    ), bi AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(ws) >= 2
                         THEN list_transform(generate_series(1, len(ws) - 1),
                                i -> ws[i] || ' ' || ws[i + 1])
                         ELSE [] END) AS f
      FROM w
    ), feats AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(f), 1, 4)) AS INT) % 1024 AS b
      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
    ), dist AS (
      SELECT b, count(*) AS raw_c,
             SUM(CASE WHEN CAST(substr(source, 4) AS INT) < 4
                      THEN 1 ELSE 0 END) AS tgt_c
      FROM feats GROUP BY b
    ), tot AS (
      SELECT CAST(SUM(raw_c) AS DOUBLE) AS raw_tot,
             CAST(SUM(tgt_c) AS DOUBLE) AS tgt_tot
      FROM dist
    ), lnr AS (
      SELECT b,
             ln((CAST(tgt_c AS DOUBLE) + 0.5)
                / ((SELECT tgt_tot FROM tot) + 512.0))
           - ln((CAST(raw_c AS DOUBLE) + 0.5)
                / ((SELECT raw_tot FROM tot) + 512.0)) AS lnr
      FROM dist
    )
    SELECT f.doc_id, f.source,
           CAST(count(*) AS BIGINT) AS n_feats,
           round(SUM(l.lnr), 6) AS log_w
    FROM feats f JOIN lnr l USING (b)
    GROUP BY f.doc_id, f.source
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): per-document
    log importance weight of the raw corpus against a TARGET domain
    (here sources src0-src3), under hashed-n-gram bag-of-features
    generative models — the published method for "give me the web
    documents that look like my high-quality domain".

    Features are unigrams + bigrams hashed into K=1024 buckets (the
    paper's hashing trick, md5-portable so the oracle reproduces the
    exact bucket assignment); both the target and raw distributions
    are add-0.5-smoothed multinomials over the buckets; a document's
    log weight is the sum over its feature OCCURRENCES of
    ln p_target(b) - ln p_raw(b). Selection is then a filter or
    top-quota on log_w — kept out of this query so the weights
    themselves are hash-checked.

    Plan (100 TB posture): ONE tokenize pass fans out to feature
    occurrences (persisted — consumed by the distribution build and
    the scoring join); the distribution table is K rows BY
    CONSTRUCTION (a constant of the config, not the corpus — unlike
    a vocabulary it cannot grow), so it and its single-row totals are
    legitimately broadcast under the broadcast_bounded policy; the
    scoring join is map-side against those K rows and the only
    shuffles are the K-bucket count and the per-doc sum. Contrast
    unigram_surprisal_score, whose |vocab| table must stay unhinted —
    the hashing trick is exactly what makes THIS distribution frame
    bounded."""
    from logicash_etl_spark.operators.joins import broadcast_bounded

    k_buckets = 1024
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    w = docs.select(
        "doc_id", "source", tokens(F.lower(F.col("text"))).alias("ws")
    )
    bigrams = F.when(
        F.size("ws") >= 2,
        F.zip_with(
            F.slice("ws", 1, F.size("ws") - 1),
            F.slice("ws", 2, F.size("ws") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = w.select(
        "doc_id",
        "source",
        F.explode(F.concat(F.col("ws"), bigrams)).alias("f"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("f"), 1, 4), 16, 10).cast("int")
            % k_buckets
        ).alias("b"),
    ).persist()
    is_target = F.substring("source", 4, 8).cast("int") < 4
    dist = feats.groupBy("b").agg(
        F.count("*").alias("raw_c"),
        F.sum(F.when(is_target, 1).otherwise(0)).alias("tgt_c"),
    )
    tot = dist.agg(
        F.sum("raw_c").cast("double").alias("raw_tot"),
        F.sum("tgt_c").cast("double").alias("tgt_tot"),
    )
    half_k = k_buckets / 2.0
    lnr = (
        dist.crossJoin(broadcast_bounded(tot, bounded=True))
        .select(
            "b",
            (
                F.log(
                    (F.col("tgt_c").cast("double") + 0.5)
                    / (F.col("tgt_tot") + half_k)
                )
                - F.log(
                    (F.col("raw_c").cast("double") + 0.5)
                    / (F.col("raw_tot") + half_k)
                )
            ).alias("lnr"),
        )
    )
    out = (
        feats.join(broadcast_bounded(lnr, bounded=True), on="b")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.round(F.sum("lnr"), 6).alias("log_w"),
        )
    )
    # materialize before unpersisting the shared feature frame
    out = out.localCheckpoint()
    feats.unpersist()
    return out


@query(
    "padding_waste_report",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             COALESCE(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> '')), 0) AS n_tok
      FROM documents
    ), a AS (
      SELECT n_tok,
             CAST((row_number() OVER (ORDER BY doc_id) - 1) // 32
                  AS BIGINT) AS batch
      FROM d
    ), s AS (
      SELECT n_tok,
             CAST((row_number() OVER (ORDER BY n_tok, doc_id) - 1) // 32
                  AS BIGINT) AS batch
      FROM d
    ), pa AS (
      SELECT batch, count(*) AS c, max(n_tok) AS m, SUM(n_tok) AS t
      FROM a GROUP BY batch
    ), ps AS (
      SELECT batch, count(*) AS c, max(n_tok) AS m, SUM(n_tok) AS t
      FROM s GROUP BY batch
    )
    SELECT 'arrival' AS strategy,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(SUM(t) AS BIGINT) AS total_tokens,
           CAST(SUM(c * m - t) AS BIGINT) AS padded_tokens,
           round(100 * CAST(SUM(c * m - t) AS DOUBLE)
                 / CAST(SUM(c * m) AS DOUBLE), 4) AS waste_pct
    FROM pa
    UNION ALL
    SELECT 'length_sorted' AS strategy,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(SUM(t) AS BIGINT) AS total_tokens,
           CAST(SUM(c * m - t) AS BIGINT) AS padded_tokens,
           round(100 * CAST(SUM(c * m - t) AS DOUBLE)
                 / CAST(SUM(c * m) AS DOUBLE), 4) AS waste_pct
    FROM ps
    """,
)
def padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for fixed-size training batches
    (B=32): every sequence in a batch pads to the batch max, so the
    batch burns c*max(len) token slots to carry sum(len) real tokens.
    The report quantifies the win of LENGTH-SORTED batching over
    arrival-order batching — the standard pre-packing lever (and the
    motivation for sequence packing, sequence_packing_stats, when
    even sorted batches waste too much).

    Both batch assignments are global ranks computed WITHOUT a
    single-partition window, via operators/partitioning.
    global_prefix_sum (range-bucketed two-pass scan; the only
    full-data movement is one shuffle into order-preserving buckets).
    The sort key for the length-sorted strategy is the composite
    n_tok * 1e9 + doc_id — unique, integer, and identical to the
    (n_tok, doc_id) lexicographic order the oracle's row_number
    uses. Everything downstream is integer counts; the one division
    rounds at the edge."""
    from logicash_etl_spark.operators.partitioning import global_prefix_sum
    from logicash_etl_spark.operators.text import token_count

    from logicash_etl_spark.operators.caching import scoped_persist

    batch_size = 32
    # NULL-text posture (r12 [contract] decision): COUNTS 0 — a NULL
    # document occupies a batch slot with zero real tokens, exactly
    # like an empty one (oracle COALESCEs identically); it also keeps
    # the composite sort key non-null for global_prefix_sum's
    # non-null order-key contract.
    # r14: persisted — BOTH batching strategies read this frame, and
    # unpersisted each re-ran the corpus scan + tokenize. The persist
    # is the 16-byte (doc_id, n_tok) length proxy, never the text:
    # tokenize once, batch-pack from metadata (guide §2.3's
    # keys-not-payloads rule).
    docs = scoped_persist(
        read_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(token_count(F.col("text")))
            .alias("n_tok"),
        )
    )

    def strategy(name: str, key: F.Column) -> DataFrame:
        keyed = docs.select(
            "n_tok", key.cast("bigint").alias("__key"), F.lit(1).alias("__one")
        )
        ranked = global_prefix_sum(keyed, "__key", "__one", out_col="__rank")
        batches = (
            ranked.select(
                "n_tok", F.expr(f"__rank div {batch_size}").alias("batch")
            )
            .groupBy("batch")
            .agg(
                F.count("*").alias("c"),
                F.max("n_tok").alias("m"),
                F.sum("n_tok").alias("t"),
            )
        )
        cap = F.sum(F.col("c") * F.col("m"))
        real = F.sum("t")
        return batches.agg(
            F.lit(name).alias("strategy"),
            F.count("*").cast("bigint").alias("n_batches"),
            real.cast("bigint").alias("total_tokens"),
            (cap - real).cast("bigint").alias("padded_tokens"),
            F.round(
                100 * (cap - real).cast("double") / cap.cast("double"), 4
            ).alias("waste_pct"),
        )

    arrival = strategy("arrival", F.col("doc_id"))
    by_len = strategy(
        "length_sorted",
        F.col("n_tok").cast("bigint") * F.lit(1_000_000_000)
        + F.col("doc_id"),
    )
    return arrival.unionByName(by_len)
