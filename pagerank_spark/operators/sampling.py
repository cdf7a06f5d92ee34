"""Deterministic sampling / selection / curation operators.

The reference repo is a PageRank CLI and has no sampling surface; these are
the selection operators a 100-TB training-data curation run needs on top of
the dedup/quality stack (operators/dedup.py, operators/textops.py):

  * ``stratified_sample`` — per-stratum Bernoulli sampling with a
    deterministic md5-derived uniform, so the sample is reproducible across
    runs/engines and the filter is a pure Column predicate (no shuffle; it
    participates in predicate pushdown and partition pruning at the scan).
  * ``top_k_per_group``   — rank<=k per group via a row_number window.
    Spark >= 3.5 rewrites the rank filter into WindowGroupLimit, which takes
    the top-k *before* the exchange on each map partition — the shuffle
    moves O(groups*k) rows, not the corpus (audited in
    tests/test_plan_audits.py).
  * ``weighted_sample``   — exact weighted sampling without replacement
    (Efraimidis-Spirakis keys over the deterministic uniform), top-k per
    group via the same WindowGroupLimit-bounded window as
    ``top_k_per_group``.
  * ``interleave_shards`` — deterministic global shuffle for training-data
    ordering: shard by a 60-bit hash, order within shard by the same hash.
    At cluster scale each shard is written independently; nothing global
    sorts the corpus.
  * ``near_dup_clusters`` — connected components over a near-duplicate pair
    list (any of the dedup.py pair generators), canonical doc = min doc_id
    per cluster. Reuses the star-contraction components operator, so the
    scaling story (alternating large/small-star, broadcast-or-shuffle mins)
    is inherited rather than re-implemented.
  * ``curate``            — the composed keep/drop pipeline (lang allowlist
    -> quality threshold -> exact-dedup keep-first) with a first-failing
    drop_reason per doc, all as one Column expression over the text-stats
    columns (single scan, no Python).

Determinism contract: every random choice derives from
``md5(seed || ',' || doc_id)`` truncated to 60 bits (textops.hexint15), the
same convention the MinHash/SimHash/LSH operators use, so the DuckDB twins
in __spark_entry__.py reproduce each sample bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15

# 2^60 — hexint15 yields a uniform integer in [0, 2^60)
_HASH_SPACE = float(1 << 60)


def shard_hash(key: Column, seed: str) -> Column:
    """THE deterministic shard-assignment hash (60-bit md5 of 'seed,key') —
    `interleave_shards` and `pack_sequences` both key their shard (% n) and
    in-shard order on exactly this expression; the DuckDB twins rebuild it
    via the shared HEX15 convention. Single definition so the cross-engine
    determinism contract can't silently fork."""
    return hexint15(F.concat(F.lit(f"{seed},"), key.cast("string")))


def uniform01(key: Column, seed: str) -> Column:
    """Deterministic U[0,1) from a key column: md5-derived 60-bit int / 2^60.

    Exactly reproducible in DuckDB as
    ``('0x' || substr(md5(seed || ',' || key), 1, 15))::BIGINT / 2^60`` —
    both engines divide the same exact int64 by the same power of two, so
    the IEEE-754 doubles are bit-identical.
    """
    return hexint15(F.concat(F.lit(f"{seed},"), key.cast("string"))) / F.lit(_HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "strat",
) -> DataFrame:
    """Keep each row iff uniform01(id) < rates[stratum] (deterministic).

    Unlike ``DataFrame.sampleBy`` the decision is a pure function of
    (seed, id) — re-running the pipeline, resuming a failed job, or running
    the DuckDB oracle selects the identical row set. The predicate is a
    literal CASE chain over ``strata_col`` (rates dicts are small — language
    / source lists), so Catalyst constant-folds it and pushes it into the
    scan; no join, no shuffle, no UDF.
    """
    u = uniform01(F.col(id_col), seed)
    rate: Column = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str = "doc_id",
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties broken by ``tie_col`` asc).

    Emits the input columns plus ``rk`` (1-based rank within the group).
    The rank<=k filter is recognized by Spark's InferWindowGroupLimit rule:
    each map task keeps only its local top-k per group before the exchange,
    so the shuffle volume is bounded by groups*k regardless of corpus size
    (plan-audited in tests/test_plan_audits.py).
    """
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(group_col).orderBy(order, F.col(tie_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    seed: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis, IPL 97(5) 2006): each row draws key ``-ln(u)/w`` from its
    deterministic uniform ``u = uniform01(seed, id)``; the k smallest keys
    — per ``group_col``, or globally when None — are exactly a draw of k
    items with probability proportional to ``weight_col`` at each step,
    without replacement. ``rk`` (1-based key order) IS the sequential E-S
    selection order, so a caller can re-cut to any k' <= k for free.

    Rows with weight <= 0 are dropped (zero selection probability; also
    keeps ``ln``'s operand positive — u = 0 itself yields key = +inf,
    i.e. "never selected", matching the u -> 0 limit). Distributed shape
    is identical to ``top_k_per_group``: the rank<=k filter rewrites to
    WindowGroupLimit, every map task keeps only its local k smallest keys
    before the exchange, so the shuffle carries O(groups*k) rows — a
    weight-proportional corpus draw at 100 TB is one bounded exchange.
    The same closed form makes the DuckDB twin a one-line window.
    """
    u = uniform01(F.col(id_col), seed)
    key = -F.log(u) / F.col(weight_col).cast("double")
    parts = [group_col] if group_col is not None else []
    w = Window.partitionBy(*parts).orderBy(F.col("_es").asc(), F.col(id_col).asc())
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es", key)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("_es")
    )


def interleave_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
) -> DataFrame:
    """Deterministic training-order assignment: (shard, pos) per row.

    shard = hash % n_shards spreads any upstream clustering (by domain, by
    crawl segment, by dedup survivor order) uniformly across shards; pos
    orders rows *within* a shard by the same hash, i.e. a reproducible
    global shuffle. Each shard's window is independent — at cluster scale
    this is one hash-partitioned exchange on ``shard`` followed by a
    per-partition sort, and shards stream to their writers without any
    global sort.
    """
    h = shard_hash(F.col(id_col), seed)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster near-duplicate pairs and pick one canonical doc per cluster.

    ``pairs`` is any (id_a, id_b) near-dup pair list from operators/dedup.py
    (ngram_jaccard_pairs, minhash_near_duplicates, simhash_near_duplicates,
    embedding_near_duplicates). Connected components — the star-contraction
    operator the link graph already uses — merges transitive matches
    (a~b, b~c => one cluster), canonical id = min doc_id in the cluster.

    Returns (doc_id, canonical_id, is_dup): every doc appears exactly once;
    docs with no near-dup are their own canonical. Downstream curation keeps
    ``~is_dup``.
    """
    from pagerank_spark.operators.components import connected_components

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges).select(
        F.col("url").alias(id_col), F.col("component").alias("canonical_id")
    )
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
            (F.coalesce("canonical_id", F.col(id_col)) != F.col(id_col)).alias("is_dup"),
        )
    )


def curate(
    docs: DataFrame,
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Composed curation verdict per doc: (doc_id, drop_reason).

    drop_reason is the FIRST failing stage, evaluated in pipeline order:
      'lang'    — predicted language not in ``allowed_langs``
      'quality' — quality_score < min_quality
      'dup'     — exact duplicate and not the keeper (min doc_id per hash)
      'kept'    — passed every stage.

    lang/quality are pure Column expressions over one scan; the dup stage is
    the same map-side-combined groupBy exact_duplicates runs, joined back on
    the 32-byte text hash. One scan + one hash-keyed self-aggregate — the
    minimum work the semantics admit.
    """
    from pagerank_spark.operators.dedup import exact_duplicates_binary
    from pagerank_spark.operators.textops import (
        normalized_text,
        with_lang_id,
        with_quality_score,
    )

    scored = with_quality_score(with_lang_id(docs, text_col), text_col)
    # join on the raw 16-byte md5, not the 32-char hex — same ~40%
    # shuffle-byte cut as exact_duplicates' groupBy, no hex round-trip
    keepers = exact_duplicates_binary(docs, text_col=text_col, id_col=id_col).select(
        "_th", "keep_id"
    )
    return (
        scored.withColumn("_th", F.unhex(F.md5(normalized_text(F.col(text_col)))))
        .join(keepers, "_th", "left")
        .select(
            F.col(id_col),
            F.when(~F.col("lang_pred").isin(*allowed_langs), F.lit("lang"))
            .when(F.col("quality_score") < min_quality, F.lit("quality"))
            .when(F.col(id_col) != F.col("keep_id"), F.lit("dup"))
            .otherwise(F.lit("kept"))
            .alias("drop_reason"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
    seed: str = "pack",
) -> DataFrame:
    """(doc_id, shard, n_tokens, seq_id, offset) — concatenate-and-chunk
    sequence packing: documents are laid out in a deterministic pseudo-random
    order within ``n_shards`` independent shards, the token stream is chunked
    into fixed ``ctx_len`` training sequences, and each document learns which
    sequence it starts in (``seq_id``, 0-based per shard) and at which token
    ``offset`` inside it. A document longer than the remaining window simply
    spills into the following sequence(s) — the standard GPT-style packing
    where nothing is padded and nothing is dropped.

    ``token_count``: expression for the per-doc token count (defaults to the
    whitespace token count, matching textops.with_token_stats.ws_tokens).

    Scale shape: ONE hash-partitioned exchange on ``shard`` + a
    per-partition sort — the cumulative sum is a running window per shard,
    never a global sort; shards stream to their writers independently.
    Fully deterministic (md5-derived shard and order), so a resumed or
    re-run job packs identically and the DuckDB twin reproduces every
    (seq_id, offset) bit-for-bit."""
    if token_count is None:
        token_count = F.size(F.split(F.col(text_col), " "))
    h = shard_hash(F.col(id_col), seed)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            token_count.cast("long").alias("n_tokens"),
        )
        .withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("_end", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            # integer `div`, not `/`+cast: exact at any token-stream length
            F.expr(f"(_end - n_tokens) div {int(ctx_len)}").alias("seq_id"),
            ((F.col("_end") - F.col("n_tokens")) % F.lit(int(ctx_len))).alias(
                "offset"
            ),
        )
    )


def temperature_rates(
    counts: dict[str, int], alpha: float, target_docs: float
) -> dict[str, float]:
    """Per-group Bernoulli rates for temperature-weighted sampling: group g
    is drawn with probability p_g ∝ n_g^alpha (alpha<1 upweights the tail —
    the multilingual-sampling rule of Lample & Conneau 2019 / mT5), scaled
    so the expected total sample size is ``target_docs``, clamped to 1.
    Plain driver math over a tiny per-group count dict.

    Cross-engine determinism: weights sum in SORTED group order (DuckDB twin
    uses ``SUM(w ORDER BY g)``), and alpha=0.5 routes through ``math.sqrt``
    (correctly rounded by IEEE-754 on every platform, unlike general pow) —
    so the twin reproduces every rate bit-for-bit before its 12dp round."""
    import math

    def w_of(n: int) -> float:
        return math.sqrt(float(n)) if alpha == 0.5 else float(n) ** alpha

    weights = {g: w_of(n) for g, n in counts.items() if n > 0}
    z = 0.0
    for g in sorted(weights):
        z += weights[g]
    return {
        g: min(1.0, target_docs * (w / z) / counts[g]) for g, w in weights.items()
    }


def temperature_sample(
    df: DataFrame,
    alpha: float,
    target_docs: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "temp",
    max_driver_groups: int = 100_000,
) -> DataFrame:
    """Deterministic temperature sampling, auto-selecting the rate plumbing
    from the stratum cardinality:

    * |groups| <= ``max_driver_groups`` (languages, sources): one tiny
      groupBy-count collect sizes the per-group rates
      (`temperature_rates`), then the selection is the same pure-Column md5
      predicate as ``stratified_sample`` — the corpus side stays one scan
      with the filter PUSHED DOWN; only |groups| rows reach the driver.
    * above the budget (per-domain temperature at 10^8 domains): no
      collect — rates are computed distributed and JOINED back on the
      stratum (``temperature_sample_joined``), selecting the identical row
      set (pytest pins the two variants bit-exact). The corpus pays one
      join instead of a pushed-down filter; that is the honest price of a
      rate table too big for a CASE literal or the driver's memory.

    The cardinality probe is ``limit(max_driver_groups + 1).collect()`` on
    the group-count aggregate — never more than the budget + 1 rows on the
    driver, and on the small-cardinality path it IS the counts collect (no
    extra job)."""
    head = (
        df.groupBy(strata_col).count().limit(max_driver_groups + 1).collect()
        if max_driver_groups > 0
        else []
    )
    if max_driver_groups <= 0 or len(head) > max_driver_groups:
        return temperature_sample_joined(
            df, alpha, target_docs, strata_col=strata_col, id_col=id_col, seed=seed
        )
    counts = {r[0]: r[1] for r in head if r[0] is not None}
    rates = temperature_rates(counts, alpha, target_docs)
    # round the rates so the DuckDB twin (C pow vs JVM pow differ in the
    # last ulp) compares the uniform against the identical literal
    rates = {g: round(r, 12) for g, r in rates.items()}
    return stratified_sample(
        df, rates, strata_col=strata_col, id_col=id_col, default_rate=0.0, seed=seed
    )


def temperature_sample_joined(
    df: DataFrame,
    alpha: float,
    target_docs: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "temp",
) -> DataFrame:
    """High-cardinality variant: rates computed distributed, joined back on
    the stratum — nothing group-sized ever reaches the driver.

    Mirrors ``temperature_rates`` operation-for-operation so the selected
    row set is IDENTICAL to the driver variant (pinned by pytest):
    weight = sqrt(n) at alpha=0.5 (IEEE sqrt is correctly rounded
    everywhere) else pow(n, alpha); the normalizer z accumulates in SORTED
    stratum order via a single-partition global window over the GROUP
    table (|groups| rows — the one deliberately serial step, same
    summation order as the driver's sorted() loop); rate = min(1,
    target*(w/z)/n) half-even-rounded to 12dp (``bround`` == Python
    ``round``). Selection is the same md5 uniform; null strata are dropped
    (the driver variant's default_rate=0.0). The rate table is an
    aggregate output, so AQE broadcast-joins it while it is small and
    shuffle-joins above the threshold."""
    counts = (
        df.groupBy(strata_col).count()
        .where(F.col(strata_col).isNotNull() & (F.col("count") > 0))
    )
    w = (
        F.sqrt(F.col("count").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("count").cast("double"), F.lit(float(alpha)))
    )
    zwin = Window.orderBy(F.col(strata_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rates = (
        counts.withColumn("_w", w)
        .withColumn("_z", F.sum("_w").over(zwin))
        .select(
            strata_col,
            F.bround(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_docs)) * (F.col("_w") / F.col("_z")) / F.col("count"),
                ),
                12,
            ).alias("_rate"),
        )
    )
    u = uniform01(F.col(id_col), seed)
    return df.join(rates, strata_col).where(u < F.col("_rate")).select(*df.columns)


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row its global quantile bucket 1..k by ``value_col`` —
    the curriculum/difficulty binning step (bucket 1 = smallest values)
    that a naive ntile() does with a GLOBAL SORT of the corpus. This
    computes it from the VALUE HISTOGRAM instead (the spearman_correlation
    recipe): one distinct-value count, one running-sum window over the
    histogram (distinct values only, never row-sized), one value-keyed
    join back. Equal values always land in the same bucket (ntile splits
    ties across buckets by arbitrary row order — useless as a deterministic
    curriculum key); bucket boundaries follow

        bucket(v) = ceil(k * cum_count(<= v) / n)   (exact BIGINTs)

    so bucket populations match ntile up to tie blocks. Returns
    (id_col, value_col, bucket).

    100-TB shape: the histogram shuffle is O(distinct values); the
    SinglePartition running-sum window is over the histogram too (token
    counts, quality scores and the like have ~1e3-1e6 distinct values —
    if the value is continuous with corpus-sized cardinality, quantize it
    first). The join back is a plain hash equi-join Catalyst broadcasts
    when the histogram fits. All arithmetic exact integer — bit-identical
    cross-engine, no float boundary wobble.
    """
    v = df.select(F.col(id_col), F.col(value_col))
    hist = v.groupBy(value_col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    w = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_total = hist.agg(F.sum("_c").alias("_n"))
    cum = hist.select(
        value_col, F.sum("_c").over(w).cast("long").alias("_cum")
    ).crossJoin(F.broadcast(n_total))
    # ceil(k * cum / n) in exact integer arithmetic (DIV, not the Column
    # `/` which is IEEE division — a double wobble at 10^12 counts could
    # flip a boundary row's bucket)
    bucket = F.expr(f"CAST((_cum * {int(k)} + _n - 1) DIV _n AS BIGINT)")
    buckets = cum.select(value_col, bucket.alias("bucket"))
    return v.join(buckets, value_col).select(id_col, value_col, "bucket")


def chunk_documents(
    docs: DataFrame,
    size: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, start, n_chunk_tokens, chunk_text) — sliding-
    window document chunking, the context-length prep step between
    cleaning and ``pack_sequences``: whitespace-token windows of ``size``
    starting every ``stride`` tokens (default non-overlapping), with a
    FULL-SIZE tail window anchored at ``n - size`` when the last step
    would otherwise leave a ragged remainder (the HF
    return_overflowing_tokens convention — every token is covered, every
    chunk except a short-doc's single one is exactly ``size`` tokens).
    A doc with ``n <= size`` yields one chunk of all its tokens.

    Scale shape: starts are built with ``sequence()`` and fanned out by
    one JVM posexplode — pure Column expressions, one codegen'd scan,
    ZERO shuffle (chunking is embarrassingly parallel); the slice/join
    of chunk text never re-tokenizes (one split per doc). chunk_id is
    the 0-based window ordinal (== start DIV stride, +1 for the ragged
    tail — the closed form the DuckDB twin recomputes independently of
    the explode ordinal).
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    step = size if stride is None else stride
    if step < 1:
        raise ValueError("stride must be >= 1")
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_t"), F.size(toks).alias("_n")
    )
    seq = F.sequence(F.lit(0), F.col("_n") - size, F.lit(step))
    ragged = (F.col("_n") > size) & (((F.col("_n") - size) % step) != 0)
    starts = (
        F.when(F.col("_n") <= size, F.array(F.lit(0)))
        .when(ragged, F.concat(seq, F.array(F.col("_n") - size)))
        .otherwise(seq)
    )
    return (
        base.select(
            "doc_id",
            "_t",
            "_n",
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("start"),
            F.least(F.lit(size), F.col("_n") - F.col("start"))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(
                    F.col("_t"),
                    F.col("start") + 1,
                    F.least(F.lit(size), F.col("_n") - F.col("start")),
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def leakage_safe_split(
    clusters: DataFrame,
    train: float = 0.75,
    val: float = 0.125,
    seed: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, canonical_id, split) — train/val/test assignment keyed on
    the NEAR-DUP CLUSTER id (:func:`near_dup_clusters` output), not the
    document id, so every member of a near-duplicate cluster lands in
    the SAME split: the contamination-safe split rule (a doc's near-copy
    in the eval split is exactly the leakage benchmark decontamination
    exists to stop). The md5 coin is the engine-wide deterministic
    uniform — re-runs, engines, and partitionings agree on every
    assignment. Pure Column filter on an already-clustered table: zero
    additional shuffle. Default cuts 0.75/0.125 are exact binary
    doubles, so the CASE boundaries cannot wobble cross-engine.
    """
    if not (0 < train < 1 and 0 <= val and train + val < 1):
        raise ValueError("need 0 < train, 0 <= val, train + val < 1")
    u = uniform01(F.col("canonical_id"), seed)
    split = (
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return clusters.select(id_col, "canonical_id", split.alias("split"))


def concentration_report(
    df: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """One row (n_groups, n_items, entropy, norm_entropy, gini, hhi) —
    the corpus-concentration diagnostics a data-governance pass reads
    before training: Shannon entropy (bits) of the group distribution,
    entropy normalized by log2(n_groups) (NULL for one group), the Gini
    coefficient of group sizes, and the Herfindahl-Hirschman index
    Σ p² (the antitrust concentration measure — here, "is the corpus
    one host in a trenchcoat?").

    Scale shape: ONE map-side-combined count per group; everything after
    runs on the GROUP table (hosts/langs/sources — corpus-count-free).
    The Gini rank is a group-sized sort (same honest cost note as
    allocate_budget). Float hygiene: entropy/HHI terms are 9dp-quantized
    and DECIMAL-summed; Gini's numerator is exact BIGINT->DECIMAL
    arithmetic with ONE final double division.
    """
    g = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    tot = g.agg(
        F.sum("_c").cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("_k"),
    )
    w = Window.orderBy(F.col("_c"), F.col("_g"))
    ranked = g.crossJoin(F.broadcast(tot)).select(
        "_g", "_c", "_n", "_k", F.row_number().over(w).alias("_i")
    )
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    ent_term = F.round(-p * F.log2(p), 9).cast("decimal(28,9)")
    hhi_term = F.round(p * p, 9).cast("decimal(28,9)")
    gini_num = (
        (F.lit(2) * F.col("_i") - F.col("_k") - 1) * F.col("_c")
    ).cast("decimal(38,0)")
    agg = ranked.agg(
        F.max("_k").alias("n_groups"),
        F.max("_n").alias("n_items"),
        F.sum(ent_term).alias("_ent"),
        F.sum(hhi_term).alias("_hhi"),
        F.sum(gini_num).alias("_gn"),
    )
    ent = F.col("_ent").cast("double")
    return agg.select(
        "n_groups",
        "n_items",
        F.round(ent, 6).alias("entropy"),
        F.when(
            F.col("n_groups") > 1,
            F.round(ent / F.log2(F.col("n_groups").cast("double")), 6),
        ).alias("norm_entropy"),
        F.round(
            F.col("_gn").cast("double")
            / (F.col("n_groups") * F.col("n_items")).cast("double"),
            6,
        ).alias("gini"),
        F.round(F.col("_hhi").cast("double"), 6).alias("hhi"),
    )


def _hist_median(values: DataFrame, col: str) -> DataFrame:
    """1-row (med,) — the EXACT lower median (smallest value whose
    cumulative count reaches ceil(n/2)) from the value histogram: one
    partial-aggregated groupBy + a window over the DISTINCT values, never
    a row-sized sort (the quantile_buckets/degree_percentiles recipe)."""
    hist = values.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.col(col), F.sum("_c").over(w).cast("long").alias("_cum")
    ).crossJoin(F.broadcast(hist.agg(F.sum("_c").cast("long").alias("_n"))))
    return cum.where(
        F.col("_cum") >= F.ceil(F.lit(0.5) * F.col("_n")).cast("long")
    ).agg(F.min(col).alias("med"))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    z: float = 3.5,
) -> DataFrame:
    """(doc_id, value, robust_z, is_outlier) — robust outlier detection by
    the median-absolute-deviation rule (Iglewicz-Hoaglin 1993): with
    med = median(x) and MAD = median(|x - med|),

        robust_z = |x - med| / (1.4826 * MAD)

    and a row is an outlier when the 6dp-ROUNDED robust_z exceeds ``z``
    (3.5 is the standard cut). Unlike mean/stddev z-scores the rule
    doesn't let the outliers inflate their own yardstick — the corpus-QC
    standard for length / quality-score / duplication-rate distributions.
    Degenerate corpus (MAD = 0, half the mass on one value): robust_z is
    NULL and any deviation at all is flagged.

    Scale shape: TWO histogram medians (each a partial-aggregated count
    over distinct values + a tiny running-sum window — no row-sized sort
    anywhere) and one broadcast of the two scalars back over the rows.
    Exact arithmetic until the single rounded division."""
    v = df.select(
        F.col(id_col).alias("doc_id"), F.col(value_col).alias("value")
    )
    med = _hist_median(v, "value")
    dev = v.crossJoin(F.broadcast(med)).select(
        "doc_id", "value", F.abs(F.col("value") - F.col("med")).alias("_dev")
    )
    mad = _hist_median(
        dev.select(F.col("_dev").alias("value")), "value"
    ).withColumnRenamed("med", "mad")
    rz = F.when(
        F.col("mad") > 0,
        F.round(F.col("_dev") / (F.lit(1.4826) * F.col("mad")), 6),
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "doc_id",
            "value",
            rz.alias("robust_z"),
            F.when(F.col("mad") > 0, rz > F.lit(float(z)))
            .otherwise(F.col("_dev") > 0)
            .alias("is_outlier"),
        )
    )


def dimensional_report(
    df: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    value_col: str = "n_chars",
) -> DataFrame:
    """(dim..., g_dim..., n_rows, total, mean) — the OLAP CUBE rollup over
    the dimension columns: every subtotal combination (per-lang,
    per-source, per-lang-x-source, grand total) in ONE pass. The corpus
    composition dashboard a curation run reads before/after filtering —
    and the one aggregation shape (GROUPING SETS) the engine's plain
    groupBy operators don't otherwise witness.

    ``g_<dim>`` = 1 when the row aggregates AWAY that dimension (the
    SQL-standard GROUPING() flag, emitted per-dimension rather than as a
    combined grouping_id so no engine-specific bit order is in the
    contract; the dimension column itself is NULL on those rows).

    Scale shape: Catalyst expands the cube to grouping sets inside ONE
    partial-aggregated exchange (rows replicate 2^d times map-side, d=2
    here); counts/sums exact BIGINTs, the mean one rounded division."""
    gb = df.cube(*[F.col(d) for d in dims])
    return gb.agg(
        *[F.grouping(d).cast("int").alias(f"g_{d}") for d in dims],
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("total"),
        F.round(
            F.sum(F.col(value_col).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean"),
    )


def mixture_plan(
    source_tokens: DataFrame,
    targets: dict[str, float],
    max_epochs: float = 1.0,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(source, n_tokens, share, planned_tokens, epochs) — the
    training-mixture plan (the Pile/Dolma/RedPajama mixture table): given
    per-source token inventories and target mixture shares, size the
    LARGEST total budget T such that no source repeats more than
    ``max_epochs`` (T = min over targeted sources of
    n_tokens * max_epochs / share), then allocate planned_tokens =
    share * T per source. Sources outside ``targets`` get share 0 and a
    0 allocation (listed, so the plan documents what it excludes);
    ``epochs`` = planned / available shows which source binds (it sits
    exactly at max_epochs).

    Shares are normalized python-side and embedded as literals — the
    whole computation after the one inventory aggregate runs on a
    source-cardinality table (tiny), as a fixed IEEE expression tree both
    engines reproduce. Raises if targets is empty, a share is negative,
    or every share is 0."""
    if not targets:
        raise ValueError("targets must be non-empty")
    if any(v < 0 for v in targets.values()):
        raise ValueError("target shares must be >= 0")
    norm = float(sum(targets.values()))
    if norm <= 0:
        raise ValueError("at least one target share must be > 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    share: Column = F.lit(0.0)
    for s, v in sorted(targets.items()):
        share = F.when(F.col(source_col) == s, F.lit(float(v) / norm)).otherwise(
            share
        )
    base = source_tokens.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        share.alias("share"),
    )
    budget = base.where(F.col("share") > 0).agg(
        F.min(
            F.col("n_tokens").cast("double") * F.lit(float(max_epochs))
            / F.col("share")
        ).alias("_T")
    )
    return base.crossJoin(F.broadcast(budget)).select(
        "source",
        "n_tokens",
        F.round(F.col("share"), 6).alias("share"),
        F.round(F.col("share") * F.col("_T"), 6).alias("planned_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("share") * F.col("_T") / F.col("n_tokens"), 6),
        ).alias("epochs"),
    )
