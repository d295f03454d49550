"""Join operators.

Reference parity: J1 broadcast left outer equi-join fact x dim
(etl_job.py:68-71) — the only join the reference has. We generalize to
the full family (semi/anti/range/as-of) because SURVEY.md section 2.3 scopes
the engine to Spark's built-ins plus the two composites Spark lacks.

Scale notes baked into each operator's strategy choice:
- dims below the broadcast threshold ship to every executor (no
  shuffle of the 100 TB fact side);
- range/as-of joins bucketize the range key first so the join is an
  equi-join on bucket (a bounded blow-up) instead of a full
  cartesian BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact x dim enrichment join; dim is broadcast by default.

    Matches the reference's hinted broadcast (dims "<200MB"). With
    ``broadcast_dim=False`` Catalyst/AQE still auto-broadcasts below
    the session threshold, or falls back to sort-merge with skew
    splitting for genuinely large dims.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def broadcast_bounded(df: DataFrame, *, bounded: bool) -> DataFrame:
    """Broadcast-hint a join side only when its cardinality is bounded
    by the CATALOG, not by the data scale.

    ``bounded=True`` marks frames whose size is a constant of the
    schema — TPC-H ``region`` (5 rows) and ``nation`` (25 rows) at
    every scale factor, literal codebooks, single-row totals. These
    are hinted unconditionally so Catalyst never shuffles 25 rows.

    ``bounded=False`` marks scale-proportional dims (``customer``,
    ``supplier``, ``part``, and anything derived from a fact table).
    The frame is returned UNHINTED: below
    ``spark.sql.autoBroadcastJoinThreshold`` Catalyst auto-broadcasts
    with no hint needed — plans at bench SF are identical — while
    above it the only effect a forced hint can have is to override
    the size check into a driver OOM; AQE's runtime-size decision is
    strictly better at 100x. (Policy adopted after the round-6
    erasure-audit finding: a forced ``F.broadcast`` on a
    fact-proportional frame is an OOM at a 100 TB fact table.)
    """
    return F.broadcast(df) if bounded else df


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS: rows of left with a match in right (no right columns)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS: referential-integrity orphan report (SURVEY section 2.3 J2)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join left rows to right rows where ``lo <= point < hi``.

    Strategy: explode each right interval into the integer buckets it
    overlaps, equi-join on bucket (+ optional keys), then apply the
    exact range predicate. Turns an O(n*m) nested-loop into a shuffle
    hash/sort-merge join — the standard trick until Spark grows a
    native range-join optimizer. ``bucket_width`` should be the typical
    interval width so each interval lands in O(1) buckets.
    """
    lb = F.floor(F.col(left_point) / F.lit(bucket_width)).alias("__bucket")
    l2 = left.withColumn("__bucket", lb)
    r2 = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor(F.col(right_hi) / F.lit(bucket_width)),
            )
        ),
    )
    on = ["__bucket"] + (extra_on or [])
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    # interval tables are typically tiny and often local (no stats) —
    # without the hint Catalyst may broadcast the big point side instead
    r2 = F.broadcast(r2) if broadcast_intervals else r2
    return l2.join(r2, on=on, how="inner").filter(cond).drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward) or earliest ``>=`` (forward),
    per key.

    Strategy (pure DataFrame, no Python boundary): union the two
    sides tagged by origin, sort within key by time, and carry the
    most recent right ROW forward as a single struct with
    ``last(ignorenulls)`` over an unbounded-preceding window — one
    shuffle on the key, no per-group pandas. The struct wrapper is
    load-bearing: it is non-null for every right row even when its
    fields are null, so a NULL field in the latest right row is
    matched AS NULL (SQL ASOF semantics) instead of skipped in favor
    of a stale older row's value. This is the classic streaming-merge
    re-expressed as a window; it scales as long as a single key's
    rows fit a partition (same constraint as any windowed op), and
    skewed keys split via AQE.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rcols = [c for c in right.columns if c not in keys and c != right_ts]
    # r13 (ADVICE): reject EVERY internal working name on BOTH sides,
    # not just __rt — a left column named __r/__t/__is_left was
    # silently clobbered by the union's tag/payload columns and came
    # back corrupted instead of raising
    _reserved = {"__rt", "__r", "__t", "__is_left"}
    clash = sorted(_reserved & (set(lcols) | set(rcols)))
    if clash:
        raise ValueError(
            f"asof_join reserves the internal column names {clash}; "
            "rename the clashing column(s) before joining"
        )

    # NULL timestamps never participate in the as-of ordering (SQL
    # ASOF semantics: a NULL ts matches nothing on either side). A
    # NULL-ts RIGHT row would otherwise sort NULLS-FIRST under the
    # ascending window and be carried forward as the 'earliest' match
    # for left rows with no real predecessor — drop them before the
    # union. NULL-ts LEFT rows stay: with right nulls gone and the
    # window ordered NULLS FIRST in BOTH directions, they sort before
    # every right row and naturally resolve to a NULL payload (the
    # left-outer posture) in the same single pass.
    right = right.filter(F.col(right_ts).isNotNull())

    # right-side payload rides as ONE struct: the struct is non-null
    # for every right row even when its FIELDS are null, so
    # last(ignorenulls) lands on the latest right ROW — a per-column
    # last(ignorenulls) would skip a legitimately-NULL field and leak
    # a STALE older row's value into the match (SQL ASOF semantics
    # take the whole row, nulls included)
    r_payload = F.struct(
        *[F.col(c).alias(c) for c in rcols],
        F.col(right_ts).alias("__rt"),
    )
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in rcols]
        + [T.StructField("__rt", right.schema[right_ts].dataType)]
    )
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        r_payload.alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left rows at equal ts => `<=` semantics
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").asc_nulls_first(), F.col("__is_left").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    elif direction == "forward":
        # desc_nulls_first so NULL-ts LEFT rows precede every right
        # row (desc defaults to NULLS LAST, which would hand them the
        # final right struct as a bogus match)
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").desc_nulls_first(), F.col("__is_left").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    filled = unioned.select(
        *keys,
        "__t",
        "__is_left",
        *[F.col(c) for c in lcols],
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
    )
    # getField, not the dotted "__r.{c}" path: a right column name
    # containing a dot would break the path parse
    return filled.filter(F.col("__is_left") == 1).select(
        *keys,
        F.col("__t").alias(left_ts),
        *[F.col(c) for c in lcols],
        *[F.col("__r").getField(c).alias(f"{c}{suffix}") for c in rcols],
        F.col("__r").getField("__rt").alias(f"{right_ts}{suffix}"),
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    block_cols: list[str] | None = None,
    prefix_len: int = 4,
    suffix_len: int = 4,
    max_block_size: int | None = None,
    collapse_exact: bool = False,
) -> DataFrame:
    """Entity-resolution fuzzy self-join: pairs of rows whose text is
    within ``max_dist`` edits, blocked so candidates never approach
    |table|^2.

    Blocking is multi-pass on text-derived keys: a pair is a candidate
    iff it shares (block_cols + first ``prefix_len`` chars) OR
    (block_cols + last ``suffix_len`` chars). Unlike a fixed-cardinality
    attribute key (25 brands => block size grows linearly with N and
    pairs with N^2), prefix/suffix key cardinality grows with text
    diversity, so per-block size stays bounded as the table grows —
    the property tests/test_extensions.py pins. A dist<=max_dist pair
    misses only when edits corrupt both ends simultaneously; that
    residual recall loss is inherent to blocking and is the documented
    ER trade (Papadakis et al., "Blocking and Filtering Techniques for
    Entity Resolution", CSUR 2020).

    Verification applies two cheap cuts before the O(m*n) DP:
    a length-difference prefilter (|len(a)-len(b)| > t implies
    dist > t) and Spark's thresholded ``levenshtein(a, b, t)`` which
    early-exits rows whose distance exceeds t.

    ``max_block_size`` is the guard for when the diversity assumption
    FAILS — a corpus whose name vocabulary does not grow with volume
    (boilerplate catalogs: the sf1 replication experiment measured
    ~100x runtime from exactly this) concentrates rows into few
    prefix/suffix blocks and candidates grow quadratically. Blocks
    larger than the cap are purged from candidate generation (block
    purging, Papadakis et al. CSUR 2020): a bounded, documented recall
    trade — pairs found ONLY via a stop-block are missed — instead of
    an unbounded k^2 blow-up. Purging is per-pass, so a pair sharing a
    hot prefix but a rare suffix is still found.

    ``collapse_exact=True`` adds an exact-collapse pre-pass: rows are
    grouped by (blocks, text), the block/verify pipeline runs on the
    DISTINCT texts only, and id pairs are expanded afterwards by
    joining each text pair back to its member ids (same-text groups
    expand directly to dist-0 pairs). Output is identical when
    ``max_block_size`` is None; with purging, block sizes are counted
    in distinct texts instead of rows. The win is corpora with heavy
    text repetition — the verify cost drops from O(row pairs) to
    O(distinct-text pairs) (sf0.1 parts: 20k rows but 64 names — the
    DP work shrinks 150x while the output, which is genuinely
    quadratic in the copies, is produced by a cheap equi-join).

    Returns (key_a, key_b, edit_dist) with key_a < key_b.
    """
    from logicash_etl_spark.operators.caching import scoped_persist

    blocks = list(block_cols or [])
    if collapse_exact:
        # unit = one distinct (blocks, text) combination; the unit key
        # embeds the block values so identical texts under DIFFERENT
        # blocks stay distinct units and never cross-expand.
        # base is persisted: ids feeds BOTH expansion sides and units
        # feeds the whole block/verify pipeline — unpersisted, the
        # (fact-sized at TPC-H 100 TB) input was re-scanned up to 8x
        # (audited r10)
        base = scoped_persist(df.select(*blocks, id_col, text_col))
        ukey = F.concat_ws("\x1f", *blocks, F.col(text_col))
        ids = base.select(
            ukey.alias("__ukey"), F.col(id_col).alias("__id")
        )
        units = base.select(
            *blocks, ukey.alias("__ukey"), F.col(text_col).alias("__utxt")
        ).dropDuplicates(["__ukey"])
        tpairs = fuzzy_self_join(
            units,
            id_col="__ukey",
            text_col="__utxt",
            max_dist=max_dist,
            block_cols=blocks,
            prefix_len=prefix_len,
            suffix_len=suffix_len,
            max_block_size=max_block_size,
        )
        a = ids.select(F.col("__ukey").alias("key_a"), F.col("__id").alias("__ida"))
        b = ids.select(F.col("__ukey").alias("key_b"), F.col("__id").alias("__idb"))
        cross = (
            tpairs.join(a, "key_a")
            .join(b, "key_b")
            .select(
                F.least("__ida", "__idb").alias("key_a"),
                F.greatest("__ida", "__idb").alias("key_b"),
                "edit_dist",
            )
        )
        same = (
            a.join(b.withColumnRenamed("key_b", "key_a"), "key_a")
            .filter(F.col("__ida") < F.col("__idb"))
            .select(
                F.col("__ida").alias("key_a"),
                F.col("__idb").alias("key_b"),
                F.lit(0).cast("int").alias("edit_dist"),
            )
        )
        return cross.unionByName(same)
    # both block passes consume keyed from both join sides (4 scans
    # of the input unpersisted); the frame is a narrow id/text/keys
    # projection
    keyed = scoped_persist(
        df.select(
            *blocks,
            F.col(id_col).alias("__id"),
            F.col(text_col).alias("__txt"),
            # left/right (not substring with negative pos): identical
            # shorter-than-n semantics across engines for the oracle
            # mirror
            F.expr(f"left({text_col}, {prefix_len})").alias("__pre"),
            F.expr(f"right({text_col}, {suffix_len})").alias("__suf"),
        )
    )

    def one_pass(key: str) -> DataFrame:
        side = keyed
        if max_block_size is not None:
            hot = (
                keyed.groupBy(*blocks, F.col(key).alias("__k"))
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > max_block_size)
                .select(*blocks, "__k")
            )
            side = keyed.join(
                F.broadcast(hot.withColumnRenamed("__k", key)),
                on=blocks + [key],
                how="left_anti",
            )
        a = side.select(
            *blocks, F.col(key).alias("__k"),
            F.col("__id").alias("key_a"), F.col("__txt").alias("name_a"),
        )
        b = side.select(
            *blocks, F.col(key).alias("__k"),
            F.col("__id").alias("key_b"), F.col("__txt").alias("name_b"),
        )
        return (
            a.join(b, on=blocks + ["__k"])
            .filter(F.col("key_a") < F.col("key_b"))
            .select("key_a", "key_b", "name_a", "name_b")
        )

    cand = (
        one_pass("__pre")
        .unionByName(one_pass("__suf"))
        .dropDuplicates(["key_a", "key_b"])
    )
    return (
        cand.filter(F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b", max_dist).cast("int")
        )
        .filter(F.col("edit_dist").between(0, max_dist))
        .select("key_a", "key_b", "edit_dist")
    )


def join_with_skew_salt(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting for pathological skew.

    The big side gets a random salt in [0, salt_buckets); the small
    side is replicated across every salt value, then the join runs on
    (key, salt). Use when AQE's skew splitting is not available/enough
    (e.g. skewed *broadcast-ineligible* dimension). At 100 TB a single
    hot key (null, 'UNKNOWN', ...) otherwise pins one task forever.
    """
    salted_big = big.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    salts = small.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("__salt"))
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def _bf_hashes(key, salt: str) -> tuple:
    """The Bloom family's shared md5 double-hash: (h1, h2) = the first
    two 32-bit words of md5(salt || key). Build, key-level probe, and
    row-level literal probe MUST stay bit-identical (a drifted copy
    means silent false negatives) — one definition keeps them
    structurally in sync."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint"),
    )


def bloom_filter_build(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Build a Bloom filter over ``keys[key_col]`` as a tiny DataFrame
    of (word, bits) rows — ``m_bits/32`` rows of packed 32-bit words.

    This is the runtime-filter pattern (Spark's own
    ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``, here as
    an explicit library operator): hash the SMALL side's join keys into
    a bitmap a few KB wide, broadcast it, and drop big-side rows whose
    keys cannot possibly join BEFORE the shuffle. At 100 TB the win is
    the shuffle you never do: a selective dimension predicate prunes
    the fact scan map-side at ~zero cost, with no false negatives by
    construction.

    Hashes are md5-derived double-hashing (h1 + i*h2 mod m) so the
    filter is engine-portable — DuckDB reproduces it bit-for-bit
    (no xxhash64 dependency). Bits pack into BIGINT words via
    ``bit_or(1 << (pos % 32))``; bit index <= 31 keeps every word
    positive and shift-safe in both engines.
    """
    if m_bits <= 0 or m_bits % 32 != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of 32, got {m_bits}"
        )
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    h1, h2 = _bf_hashes(F.col(key_col), salt)
    # null keys carry no information (a Bloom filter stores value
    # hashes) and would add a junk null-word row to the bitmap
    probes = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("__i"),
        h1.alias("__h1"),
        h2.alias("__h2"),
    ).select(
        F.pmod(F.col("__h1") + F.col("__i") * F.col("__h2"), F.lit(m_bits)).alias("__pos")
    )
    return probes.select(
        F.expr("__pos div 32").alias("word"),
        F.expr("CAST(1 AS BIGINT) << CAST(__pos % 32 AS INT)").alias("__bit"),
    ).groupBy("word").agg(F.bit_or("__bit").alias("bits"))


def bloom_filter_probe(
    df: DataFrame, key_col: str, bloom: DataFrame,
    m_bits: int = 4096, k_hashes: int = 3, salt: str = "bf",
    verdict_col: str = "bloom_pass",
) -> DataFrame:
    """Tag each row of ``df`` with ``bloom_pass``: True iff all
    k hash positions of its key are set in the broadcast bitmap.

    The verdict is a pure function of the KEY, so it is computed once
    per distinct key (explode k probes -> broadcast-join the bitmap
    -> all-k-hit per key) and broadcast-joined back to ``df`` — the
    big side itself never shuffles, and duplicate keys cost nothing
    extra. Null keys cannot be members (a Bloom filter stores hashes
    of values): they get ``bloom_pass = False``. False positives
    possible (rate ~ (1-e^{-kn/m})^k), false negatives impossible."""
    h1, h2 = _bf_hashes(F.col("__key"), salt)
    probes = (
        df.select(F.col(key_col).alias("__key"))
        .filter(F.col("__key").isNotNull())
        .distinct()
        .withColumn("__h1", h1)
        .withColumn("__h2", h2)
        .select(
            "__key",
            "__h1",
            "__h2",
            F.explode(
                F.array(*[F.lit(i) for i in range(k_hashes)])
            ).alias("__i"),
        )
        .select(
            "__key",
            F.pmod(
                F.col("__h1") + F.expr("__i * __h2"), F.lit(m_bits)
            ).alias("__pos"),
        )
        .select(
            "__key",
            F.expr("__pos div 32").alias("word"),
            F.expr("CAST(__pos % 32 AS INT)").alias("__bit"),
        )
    )
    hits = probes.join(F.broadcast(bloom), on="word", how="left").select(
        "__key",
        F.coalesce(
            F.expr("((bits >> __bit) & 1) = 1"), F.lit(False)
        ).alias("__hit"),
    )
    verdict = hits.groupBy("__key").agg(
        (F.count(F.when(F.col("__hit"), 1)) == k_hashes).alias(verdict_col)
    )
    # join strategy left to Catalyst: the verdict frame is one row per
    # distinct key — tiny for dimension-selective filters (broadcast),
    # a key-level shuffle at worst (never a row-level one)
    return (
        df.join(verdict, on=df[key_col] == F.col("__key"), how="left")
        .withColumn(verdict_col, F.coalesce(verdict_col, F.lit(False)))
        .drop("__key")
    )


def bloom_filter_probe_literal(
    df: DataFrame, key_col: str, bloom: DataFrame,
    m_bits: int = 4096, k_hashes: int = 3, salt: str = "bf",
    verdict_col: str = "bloom_pass",
) -> DataFrame:
    """Row-level Bloom probe with ZERO shuffle and ZERO join: the
    bitmap's ``m_bits/32`` packed words (128 BIGINTs at the default)
    are collected once to the driver and inlined as a literal array;
    each row's k md5 probes then evaluate as a pure JVM expression
    inside whole-stage codegen — the probed frame's partitioning is
    untouched and no verdict frame ever exists.

    This is the right probe when keys are ~unique per row (document
    fingerprints): the key-level variant above (``bloom_filter_probe``)
    would pay a ``distinct()`` plus a verdict join-back — two full
    shuffles of a frame the size of the input — for verdicts that are
    never shared between rows. Here the only cluster cost is one md5
    + 2k integer ops per row, and the bitmap literal ships inside the
    serialized plan (a few KB). Prefer ``bloom_filter_probe`` only for
    FK-style keys where few distinct keys cover many rows AND the
    bitmap is too large to inline.

    Null keys cannot be members: ``bloom_pass = False``. False
    positives possible, false negatives impossible — identical
    semantics (and identical bits, same md5 double-hash) to the
    key-level probe."""
    if m_bits <= 0 or m_bits % 32 != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of 32, got {m_bits}"
        )
    if m_bits > (1 << 20):
        # the bitmap ships as a literal inside every serialized task;
        # beyond ~128 KB of words the key-level probe's broadcast
        # join is the right tool — fail loudly instead of bloating
        # the plan silently
        raise ValueError(
            f"m_bits={m_bits} too large to inline as a plan literal "
            "(max 2^20); use bloom_filter_probe (broadcast join) instead"
        )
    n_words = m_bits // 32
    # bounded driver collect: exactly m_bits/32 rows (128 at default)
    words = {int(r["word"]): int(r["bits"]) for r in bloom.collect()}
    bad = [i for i in words if i >= n_words or i < 0]
    if bad:
        # a word index beyond m_bits/32 means the filter was BUILT
        # with a larger m_bits than this probe was told — silently
        # dropping those set bits would produce false negatives,
        # breaking the probe's "false negatives impossible" contract
        raise ValueError(
            f"bloom bitmap has word indices {sorted(bad)[:4]}... outside "
            f"[0, {n_words}): build/probe m_bits mismatch "
            f"(probe m_bits={m_bits})"
        )
    arr = F.array(
        *[F.lit(words.get(i, 0)).cast("bigint") for i in range(n_words)]
    )
    t = "__bfp"
    h1, h2 = _bf_hashes(F.col(key_col), salt)
    out = (
        df.withColumn(f"{t}_words", arr)
        .withColumn(f"{t}_h1", h1)
        .withColumn(f"{t}_h2", h2)
    )
    hit = F.lit(True)
    for i in range(k_hashes):
        pos = f"pmod({t}_h1 + {i} * {t}_h2, {m_bits})"
        hit = hit & F.expr(
            f"((element_at({t}_words, CAST(({pos}) DIV 32 AS INT) + 1)"
            f" >> CAST(({pos}) % 32 AS INT)) & 1) = 1"
        )
    return (
        out.withColumn(verdict_col, F.coalesce(hit, F.lit(False)))
        .drop(f"{t}_words", f"{t}_h1", f"{t}_h2")
    )


def qgram_edit_join(
    df: DataFrame,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """LOSSLESS edit-distance self-join over the DISTINCT values of
    ``str_col``: every unordered pair within ``max_dist`` Levenshtein
    edits, with no blocking recall loss — the complement to
    ``fuzzy_self_join`` (which trades recall for prefix/suffix
    blocking).

    Candidate generation uses two filters that are THEOREMS, not
    heuristics (Gravano et al., "Approximate String Joins in a
    Database (Almost) for Free", VLDB 2001):

    - count filter: a string of length l has l-q+1 positional
      q-grams and one edit destroys at most q of them, so
      ed(a,b) <= d implies the q-gram multisets share at least
      ``max(la,lb) - q + 1 - d*q`` grams. Pairs are generated from a
      q-gram inverted index and kept only when the multiset overlap
      (sum of min(count_a, count_b)) meets that bound.
    - length filter: |la - lb| > d implies ed > d.

    Strings too short for the count bound to bite (both shorter than
    ``q*(d+1)``) are compared within the short-string pool directly —
    a bounded, broadcast-size set by construction (there are only
    |alphabet|^l strings that short; at corpus scale the pool is
    vocabulary-bounded, not row-bounded). Survivors are verified with
    Spark's thresholded ``levenshtein(a, b, d)`` (early-exit DP).

    Operating on distinct strings is the scale posture: the quadratic
    term is vocabulary^2-bounded, never rows^2 (the same collapse
    ``fuzzy_self_join(collapse_exact=True)`` applies); callers expand
    back to rows with an equi-join on the string.

    Returns (name_a, name_b, dist) with name_a < name_b, dist BIGINT.
    """
    from logicash_etl_spark.operators.caching import scoped_persist

    # names is the vocabulary-bounded distinct frame and feeds SIX
    # consumers (both gram sides, both length sides, both short-pool
    # sides) — unpersisted, each re-scanned the fact-sized input
    # (6 scans, audited r10); grams feeds both inverted-index sides
    names = scoped_persist(
        df.select(F.col(str_col).alias("nm"))
        .filter(F.col("nm").isNotNull())
        .distinct()
        .withColumn("ln", F.length("nm"))
    )
    cutoff = q * (max_dist + 1)

    # positional q-gram multiset -> (nm, gram, cnt)
    grams = scoped_persist(
        names.filter(F.col("ln") >= q)
        .select(
            "nm",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("ln") - q + 1),
                    lambda i: F.col("nm").substr(i, F.lit(q)),
                )
            ).alias("g"),
        )
        .groupBy("nm", "g")
        .agg(F.count("*").alias("cnt"))
    )
    ga = grams.select(F.col("nm").alias("name_a"), "g", F.col("cnt").alias("ca"))
    gb = grams.select(F.col("nm").alias("name_b"), "g", F.col("cnt").alias("cb"))
    la = names.select(F.col("nm").alias("name_a"), F.col("ln").alias("la"))
    lb = names.select(F.col("nm").alias("name_b"), F.col("ln").alias("lb"))
    qcand = (
        ga.join(gb, on="g")
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("name_a", "name_b")
        .agg(F.sum(F.least("ca", "cb")).alias("shared"))
        .join(la, on="name_a")
        .join(lb, on="name_b")
        .filter(F.abs(F.col("la") - F.col("lb")) <= max_dist)
        .filter(
            F.col("shared")
            >= F.greatest(
                F.lit(1), F.greatest("la", "lb") - F.lit(q - 1 + max_dist * q)
            )
        )
        .select("name_a", "name_b")
    )
    # short-short pool: the count bound is vacuous only when BOTH
    # lengths are < q*(d+1); such pairs may share zero q-grams yet
    # still be within d edits
    short = names.filter(F.col("ln") < cutoff)
    sa = short.select(F.col("nm").alias("name_a"), F.col("ln").alias("la2"))
    sb = short.select(F.col("nm").alias("name_b"), F.col("ln").alias("lb2"))
    scand = (
        sa.crossJoin(F.broadcast(sb))
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("la2") - F.col("lb2")) <= max_dist)
        )
        .select("name_a", "name_b")
    )
    cand = qcand.unionAll(scand).distinct()
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        cand.withColumn("dist", dist.cast("bigint"))
        .filter(F.col("dist") >= 0)
        .select("name_a", "name_b", "dist")
    )
