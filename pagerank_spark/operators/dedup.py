"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Scale design (the point of each choice at 10^12 documents):

  * exact dedup        — one hash-groupBy on a 60-bit content fingerprint;
                         map-side partial aggregation, no pairwise work.
  * n-gram Jaccard     — shingle inverted index (doc ⋈ doc on shared shingle);
                         hot shingles are dropped by a document-frequency cap
                         (stopword shingles would otherwise produce O(df²)
                         candidate pairs — the classic skew bomb).
  * MinHash + LSH      — each shingle is md5-hashed ONCE; the k=16 minhashes
                         are k universal-hash permutations (a_j*h + b_j) mod p
                         over that single 60-bit hash (pure int64 arithmetic,
                         p = 2^31-1 so a_j*h never overflows int64), computed
                         as 16 min() aggregates in one pass. Band keys are
                         emitted with one posexplode and candidate pairs come
                         from a single equi-join on the band key — linear-ish
                         in the number of near-dups, not quadratic in corpus
                         size, and ~16x cheaper per shingle than hashing k
                         times (the round-1 bench hog).
  * SimHash            — 60-bit signature, computed entirely JVM-side
                         (explode tokens × explode bit positions → two
                         groupBys); whole-stage codegen, no Python. Candidate
                         pairs use 3-of-(max_hamming+3) chunk-combination keys
                         (HmSearch-style generalized pigeonhole): 30-bit keys
                         at max_hamming=3, so bucket population stays
                         sub-quadratic at 10^9+ docs (a 15-bit key would put
                         ~3e7 docs per bucket at 10^12 and go quadratic).
  * embedding cosine   — LSH-bucketed candidate generation (sign-random-
                         projection planes + Hamming-1 multiprobe) with exact
                         cosine rerank; the all-pairs crossJoin survives only
                         as the explicit ``method='exact'`` small-corpus path.

All hashing uses the first 15 hex chars of md5 (60 bits) so every operator
has a bit-exact DuckDB oracle (see __spark_entry__.py). No per-row Python
anywhere — the BASELINE.json input_hint's hard constraint.

The reference (laurenleadbetter/Pagerank) has no dedup layer; these extend
the engine to corpus curation per the build brief.
"""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pagerank_spark.operators.textops import hexint15

MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows
LSH_ROWS = MINHASH_K // LSH_BANDS
SIMHASH_BITS = 60

# universal-hash modulus for the minhash permutation family: Mersenne prime
# 2^31-1. h is first reduced mod p (< 2^31), so a_j*h1 + b_j < 2^62 — no
# int64 overflow on either engine (DuckDB raises on overflow; Spark wraps).
MINHASH_P = (1 << 31) - 1


def minhash_params(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) permutation constants, md5-derived so the
    DuckDB oracle inlines the identical literals. a_j in [1, p-1], b_j in
    [0, p-1]."""
    out = []
    for j in range(k):
        a = int(hashlib.md5(f"mh_a{j}".encode()).hexdigest()[:15], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mh_b{j}".encode()).hexdigest()[:15], 16) % MINHASH_P
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates_binary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(_th, n_docs, keep_id) keyed by the RAW 16-byte md5 of the normalized
    text — collision-safe at any corpus size (unlike a 64-bit hash) while the
    shuffle moves 16-byte binary keys instead of 32-char hex strings, a ~40%
    shuffle-byte cut on this (key, id)-shaped exchange at corpus scale.
    Internal form for callers that join back on the hash (curate); the
    public `exact_duplicates` converts to the hex form of the contract."""
    from pagerank_spark.operators.textops import normalized_text

    norm = normalized_text(F.col(text_col))
    return (
        docs.select(F.unhex(F.md5(norm)).alias("_th"), F.col(id_col))
        .groupBy("_th")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_docs, keep_id) — one row per distinct normalized text;
    keep_id = min doc id (the canonical survivor). Single hash groupBy on
    the binary md5 (see exact_duplicates_binary), hex output."""
    return exact_duplicates_binary(docs, text_col, id_col).select(
        F.lower(F.hex("_th")).alias("text_hash"), "n_docs", "keep_id"
    )


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep only the min-id doc per distinct normalized text."""
    keep = exact_duplicates(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams per document, JVM-side via
    sequence/transform/slice (no Python). Documents shorter than n words
    contribute their whole text as a single shingle."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), ' '), i, {n})))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def shingle_hashes(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sh) — DISTINCT 60-bit md5 hashes of the word n-grams per doc.

    The hot-path twin of ``shingles``: hashing happens BEFORE the distinct,
    so every wide exchange downstream (this distinct, the inverted-index
    self-join, the df-count groupBy, the minhash groupBy) moves 8-byte int64
    keys instead of 20-40-byte shingle strings — a ~3-5x shuffle-byte cut at
    corpus scale. 60-bit collisions (~n²/2^61 expected) are the same risk the
    minhash/simhash operators already accept, and the DuckDB oracles hash
    identically so outputs stay bit-exact."""
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), ' '), i, {n})))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("_s"))
        .select("doc_id", hexint15(F.col("_s")).alias("sh"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with exact n-gram Jaccard >= threshold.

    Candidate generation via the shingle inverted index; ``max_shingle_df``
    drops shingles appearing in more than that many docs from CANDIDATE
    GENERATION ONLY (skew cap — a shingle shared by 10^6 docs would emit
    10^12 candidate pairs). The Jaccard score itself is always exact over the
    full un-capped shingle sets (intersection recomputed per candidate pair
    via array_intersect), so the cap can only miss pairs whose EVERY common
    shingle is hot — it never underestimates a reported score.

    All index/join/groupBy traffic is keyed on the 60-bit shingle HASH
    (``shingle_hashes``) so wide shuffles move int64s, never the strings;
    the intersection count over hash sets equals the string-set count modulo
    negligible 60-bit collisions, which the DuckDB oracle shares."""
    sh = shingle_hashes(docs, n, text_col, id_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is None:
        # exact inverted-index path: intersection counts straight off the join
        a = sh.select(F.col("sh"), F.col("doc_id").alias("id_a"))
        b = sh.select(F.col("sh"), F.col("doc_id").alias("id_b"))
        inter = (
            a.join(b, "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        # capped candidates, exact rescore: pairs from the cold-shingle index,
        # then exact |A ∩ B| from the full per-doc hash sets (doc-bounded
        # arrays; JVM-side array_intersect over int64)
        df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        idx = sh.join(
            df_counts.where(F.col("_df") <= max_shingle_df).select("sh"), "sh"
        )
        cand = (
            idx.select(F.col("sh"), F.col("doc_id").alias("id_a"))
            .join(idx.select(F.col("sh"), F.col("doc_id").alias("id_b")), "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        sets = sh.groupBy("doc_id").agg(F.collect_list("sh").alias("_shs"))
        inter = (
            cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("_shs").alias("_sa")), "id_a")
            .join(sets.select(F.col("doc_id").alias("id_b"), F.col("_shs").alias("_sb")), "id_b")
            .withColumn("n_inter", F.size(F.array_intersect(F.col("_sa"), F.col("_sb"))))
            .select("id_a", "id_b", "n_inter")
        )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, c_a_in_b, c_b_in_a) — DIRECTIONAL n-gram containment
    c(X in Y) = |X ∩ Y| / |X| for pairs where either direction >= threshold.

    Jaccard misses the quote/subset case a crawl is full of: a short doc
    wholly embedded in a long one scores |A|/|B| under Jaccard (tiny) but
    1.0 under containment (Broder's original resemblance-vs-containment
    split, SEQUENCES'97). Same scale machinery as ``ngram_jaccard_pairs``:
    int64 shingle-hash keys everywhere, optional hot-shingle df cap for
    candidate generation only, exact intersection on the full sets — the
    cap can only miss pairs whose every common shingle is hot."""
    sh = shingle_hashes(docs, n, text_col, id_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is None:
        a = sh.select(F.col("sh"), F.col("doc_id").alias("id_a"))
        b = sh.select(F.col("sh"), F.col("doc_id").alias("id_b"))
        inter = (
            a.join(b, "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        idx = sh.join(
            df_counts.where(F.col("_df") <= max_shingle_df).select("sh"), "sh"
        )
        cand = (
            idx.select(F.col("sh"), F.col("doc_id").alias("id_a"))
            .join(idx.select(F.col("sh"), F.col("doc_id").alias("id_b")), "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        sets = sh.groupBy("doc_id").agg(F.collect_list("sh").alias("_shs"))
        inter = (
            cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("_shs").alias("_sa")), "id_a")
            .join(sets.select(F.col("doc_id").alias("id_b"), F.col("_shs").alias("_sb")), "id_b")
            .withColumn("n_inter", F.size(F.array_intersect(F.col("_sa"), F.col("_sb"))))
            .select("id_a", "id_b", "n_inter")
        )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("c_a_in_b", F.round(F.col("n_inter").cast("double") / F.col("n_a"), 6))
        .withColumn("c_b_in_a", F.round(F.col("n_inter").cast("double") / F.col("n_b"), 6))
        .where((F.col("c_a_in_b") >= threshold) | (F.col("c_b_in_a") >= threshold))
        .select("id_a", "id_b", "c_a_in_b", "c_b_in_a")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame,
    k: int = MINHASH_K,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) — ONE md5 per shingle, then k universal-hash
    permutations min((a_j*h + b_j) mod p) as k min() aggregates in one pass
    (map-side combined). Pure int64 arithmetic after the single hash — this
    replaced k md5 invocations per shingle row, which was 59% of the round-1
    bench suite. The groupBy shuffles the pre-hashed int64 shingle key
    (``shingle_hashes``), not the shingle string."""
    sh = shingle_hashes(docs, n, text_col, id_col)
    h = F.pmod(F.col("sh"), F.lit(MINHASH_P))
    aggs = [
        F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P))).alias(f"mh{j}")
        for j, (a, b) in enumerate(minhash_params(k))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """(id_a, id_b) distinct pairs agreeing on at least one full LSH band.

    All band keys are emitted with one posexplode (band id folded into the
    md5 input) and candidates come from a single self-equi-join on band_key —
    one shuffle instead of the round-1 version's ``bands`` unioned
    self-joins."""
    keys = F.array(*[
        F.md5(F.concat_ws(",", F.lit(str(b)),
                          *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]))
        for b in range(bands)
    ])
    bk = sigs.select(F.col("doc_id"), F.explode(keys).alias("band_key"))
    left = bk.select("band_key", F.col("doc_id").alias("id_a"))
    right = bk.select("band_key", F.col("doc_id").alias("id_b"))
    return (
        left.join(right, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, est_jaccard) — LSH candidates whose estimated Jaccard
    (matching minhash fraction) >= threshold."""
    sigs = minhash_signatures(docs, k, n, text_col, id_col).persist()
    cand = lsh_candidate_pairs(sigs)
    a = sigs.select(F.col("doc_id").alias("id_a"), *[F.col(f"mh{j}").alias(f"a{j}") for j in range(k)])
    b = sigs.select(F.col("doc_id").alias("id_b"), *[F.col(f"mh{j}").alias(f"b{j}") for j in range(k)])
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(k)
    )
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("est_jaccard", F.round(matches.cast("double") / k, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    docs: DataFrame, bits: int = SIMHASH_BITS, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash) — 60-bit SimHash over distinct lowercase whitespace
    tokens. Entirely JVM-side: explode tokens → md5 60-bit hash → explode bit
    positions → signed vote per bit → majority → recompose.

    At scale the bit-explode multiplies rows by 60 but stays in whole-stage
    codegen and combines map-side; no Python crossing."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
        )
        .distinct()
        .withColumn("h", hexint15(F.col("tok")))
    )
    votes = (
        toks.select(
            "doc_id",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        )
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(h, j) & 1") == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_near_duplicates(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with SimHash Hamming distance <= max_hamming.

    Candidate generation (HmSearch-style generalized pigeonhole): split the
    60-bit signature into ``max_hamming + 3`` chunks; a pair within distance
    max_hamming dirties at most max_hamming chunks, so at least 3 chunks are
    clean and the pair shares at least one 3-chunk COMBINATION key. All
    C(max_hamming+3, 3) keys are emitted with one posexplode and candidates
    come from a single self-equi-join on (combo_id, key). EXACT (the final
    popcount filter is over the full signature).

    Scale rationale: at max_hamming=3 the keys are 3x10 = 30 bits (2^30
    buckets) vs the naive 1-of-4 pigeonhole's 15-bit chunks (2^15 buckets,
    ~3e7 docs/bucket at 10^12 docs => quadratic within-bucket joins). The
    20x key fan-out is linear and map-side; the join stays sub-quadratic."""
    sigs = simhash(docs, SIMHASH_BITS, text_col, id_col).persist()
    n_chunks = max_hamming + 3
    width = SIMHASH_BITS // n_chunks
    mask = (1 << width) - 1

    def chunk(c: int):
        return F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))

    combos = list(itertools.combinations(range(n_chunks), 3))
    keys = F.array(*[
        F.struct(
            F.lit(ci).alias("combo_id"),
            (chunk(c0) + F.shiftleft(chunk(c1), width) + F.shiftleft(chunk(c2), 2 * width))
            .alias("key"),
        )
        for ci, (c0, c1, c2) in enumerate(combos)
    ])
    bk = sigs.select(
        "doc_id", "simhash", F.explode(keys).alias("_k")
    ).select("doc_id", "simhash", F.col("_k.combo_id").alias("combo_id"), F.col("_k.key").alias("key"))
    left = bk.select("combo_id", "key", F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    right = bk.select("combo_id", "key", F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        left.join(right, ["combo_id", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    planes: int | None = None,
    tables: int | None = None,
    dim: int | None = None,
    target_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    .. warning:: the default ``method='lsh'`` is APPROXIMATE — recall < 1 by
       construction (only pairs colliding in some LSH table are candidates).
       This changed from the exhaustive all-pairs default in an earlier
       version; callers needing guaranteed-complete output on a small corpus
       must pass ``method='exact'``. Quantify the miss rate for your
       threshold with ``similarity.recall_estimate(threshold, planes,
       tables)`` and raise ``tables`` to buy recall at linear cost.

    ``method='lsh'`` (the scale path): sign-random-projection bucketed
    candidates — ``planes`` auto-sized to the corpus (``auto_planes``) so
    buckets stay ~``target_bucket`` rows at any n, ``tables`` OR-ed plane
    tables for recall, Hamming-1 multiprobe, exact cosine rerank; no
    crossJoin in the plan (see similarity.lsh_near_duplicate_pairs).

    ``method='exact'``: all-pairs crossJoin — O(n²), the small-corpus /
    oracle fallback ONLY. Never use at scale."""
    if method == "lsh":
        from pagerank_spark.operators import similarity

        kw = {}
        if tables is not None:
            kw["tables"] = tables
        if target_bucket is not None:
            kw["target_bucket"] = target_bucket
        return similarity.lsh_near_duplicate_pairs(
            embeddings, threshold=threshold, planes=planes,
            id_col=id_col, vec_col=vec_col, dim=dim, **kw,
        )
    if method != "exact":
        raise ValueError(f"unknown method {method!r}; use 'lsh' or 'exact'")
    norm = F.sqrt(F.expr(f"aggregate({vec_col}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), norm.alias("_n")
    )
    a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, eval_ngram_hits, contaminated) — for every training document,
    the number of DISTINCT eval-set word n-grams it contains, and a flag when
    that count reaches ``min_hits``.

    Benchmark decontamination for training pipelines (the GPT-3 appendix-C /
    Pile-style n-gram overlap rule): any training doc sharing n-grams with a
    held-out eval set is flagged so evaluation doesn't score memorized spans.
    The reference has no document layer (its corpus is a link graph); this is
    one of the training-data extensions the build brief mandates.

    Scale shape: the eval set is benchmark-sized (orders of magnitude smaller
    than the corpus), so its distinct n-gram hash set — 8-byte int64s via
    ``shingle_hashes`` — is BROADCAST; the corpus side is one scan + explode
    with the semi-join applied map-side (no shuffle of corpus shingles), and
    the only wide exchange is the final partial-aggregated groupBy(doc_id)
    over the hits. The left join back to docs is deliberately NOT
    broadcast-hinted: a boilerplate n-gram in the eval set can contaminate a
    corpus-sized fraction of docs, so the hit table is eval-bounded only in
    the best case — the planner (AQE) broadcasts it when runtime stats say
    it is actually small, and shuffles it when it is not."""
    ev = (
        shingle_hashes(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select("sh").distinct()
    )
    hits = (
        shingle_hashes(docs, n=n, text_col=text_col, id_col=id_col)
        .join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("eval_ngram_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("eval_ngram_hits"), F.lit(0).cast("long")).alias(
                "eval_ngram_hits"
            ),
            (
                F.coalesce(F.col("eval_ngram_hits"), F.lit(0).cast("long"))
                >= F.lit(min_hits)
            ).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# duplicate-span statistics (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — gram-granularity approximation of the
# exact-substring pass)
# ---------------------------------------------------------------------------

def doc_novelty(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram novelty: (doc_id, n_shingles, n_unique, novelty)
    with ``novelty`` = the fraction of the doc's DISTINCT word n-grams that
    appear in NO other document — the per-doc complement of the
    corpus-level :func:`duplicate_span_stats` profile, and the ranking
    signal data curation uses to keep the most-informative copy of heavily
    templated content (high novelty = original text; near-zero = boilerplate
    assembled from phrases the corpus already has).

    Plan shape: rides :func:`shingle_hashes` (int64 60-bit keys before any
    exchange), ONE map-side-combined df count on the shingle key, one
    shingle-keyed join back, one doc-keyed rollup. Counts are exact
    BIGINTs; novelty is one IEEE division rounded 9 dp.
    """
    sh = shingle_hashes(docs, n=n, text_col=text_col, id_col=id_col)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.round(
                F.col("n_unique").cast("double") / F.col("n_shingles").cast("double"),
                9,
            ).alias("novelty"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document duplicated-span profile: (doc_id, n_grams, n_dup_grams,
    dup_fraction) where n_dup_grams counts the doc's DISTINCT word n-grams
    that also occur in at least one OTHER document.

    This is the scalable approximation of suffix-array exact-substring dedup:
    a span of k >= n duplicated tokens shows up as k-n+1 duplicated n-grams,
    so dup_fraction ranks documents by how much of their text exists
    elsewhere in the corpus — the signal Lee et al. cut on.

    Plan shape: shingle_hashes emits 8-byte int64 gram keys BEFORE any wide
    exchange; the document-frequency aggregate and the gram-keyed join that
    carries df back to (doc_id, sh) then reuse the same hash partitioning
    (one exchange feeds both sides), and the final per-doc rollup is a
    map-side-combined count. Nothing in the plan holds more than
    (gram, int) state, so the operator survives any corpus size that the
    shuffle tier survives.
    """
    sh = shingle_hashes(docs, n=n, text_col=text_col, id_col=id_col)
    df_ = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df_, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).cast("long").alias("n_dup_grams"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        F.round(F.col("n_dup_grams") / F.col("n_grams"), 6).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet-style, Wenzek et al. 2020: drop duplicated
# paragraphs corpus-wide, first occurrence wins)
# ---------------------------------------------------------------------------

def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph dedup: (doc_id, n_paras, n_kept, clean_text)
    where every paragraph whose normalized text already occurred at a
    smaller (doc_id, paragraph_index) is removed and ``clean_text`` is the
    surviving paragraphs re-joined in original order.

    First-occurrence-wins is the CCNet semantics (boilerplate headers/
    footers vanish from every document except the first crawled copy).

    Plan shape: posexplode paragraphs → groupBy(fingerprint) with a
    MAP-SIDE-COMBINABLE min(struct(doc_id, idx)) — NOT a row_number window:
    a window partitioned by the fingerprint would sort-buffer every copy of
    a hot boilerplate paragraph in one task, while min(struct) partial-
    aggregates so a 10^8-copy footer reduces to one row per map task before
    the exchange. The winner table (one row per distinct paragraph) joins
    back on the fingerprint — AQE's skew-join splits any residual hot key —
    and the per-doc rollup rebuilds order with array_sort.
    """
    # F.split treats sep as a Java regex while array_join below uses it
    # literally — \Q...\E-quote it (Pattern.quote) so a separator containing
    # metacharacters ('. ', '||') splits on exactly the bytes it rejoins with
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep_rx)).alias("idx", "para"),
    ).where(F.trim(F.col("para")) != "")
    keyed = paras.withColumn(
        "pk", hexint15(F.regexp_replace(F.trim(F.lower(F.col("para"))), r"\s+", " "))
    )
    firsts = keyed.groupBy("pk").agg(
        F.min(F.struct("doc_id", "idx")).alias("w")
    )
    marked = keyed.join(firsts, "pk").withColumn(
        "is_first",
        (F.col("doc_id") == F.col("w.doc_id")) & (F.col("idx") == F.col("w.idx")),
    )
    per_doc = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum(F.when(F.col("is_first"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("is_first"), F.struct("idx", "para"))
                        )
                    ),
                    lambda x: x["para"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )
    return per_doc.select("doc_id", "n_paras", "n_kept", "clean_text")


# ---------------------------------------------------------------------------
# host-conditional boilerplate removal (CCNet/Dolma-style: strip lines that
# repeat across most pages of the SAME host — nav menus, footers, cookie
# banners — while identical wording on unrelated hosts stays untouched)
# ---------------------------------------------------------------------------

def host_boilerplate(
    docs: DataFrame,
    min_frac: float = 0.5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "source",
    sep: str = "\n",
) -> DataFrame:
    """Per-host boilerplate line removal: (doc_id, n_lines, n_kept,
    clean_text) where a line is boilerplate for host h iff its normalized
    form occurs in >= ``min_docs`` distinct documents of h AND in >=
    ``min_frac`` of h's documents. Unlike :func:`paragraph_dedup` (corpus-
    wide, first copy survives) this removes EVERY copy, but only when the
    repetition is host-local — the footer of one site never suppresses the
    same sentence quoted on another.

    Plan shape: one host doc-count aggregate (host-sized); lines explode to
    60-bit int64 keys BEFORE the wide exchange; per-(host, line) distinct-doc
    counts are two stacked partial aggregates on (host, lh, doc_id) then
    (host, lh); the boilerplate set (tiny — lines crossing the frequency
    bar) joins back on (host, lh) and the per-doc rollup rebuilds order with
    array_sort. Whitespace-only segments are dropped before counting, so
    n_lines counts content lines. No Python anywhere.
    """
    pat = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    host_docs = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("host_n")
    )
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), pat)).alias("idx", "ln"),
    ).where(F.trim(F.col("ln")) != "")
    keyed = lines.withColumn(
        "lh", hexint15(F.regexp_replace(F.trim(F.lower(F.col("ln"))), r"\s+", " "))
    )
    # distinct-doc frequency per (host, line): dedup per doc first (a doc
    # repeating its own header counts once), then a map-side-combined count
    freq = (
        keyed.select("host", "lh", "doc_id")
        .distinct()
        .groupBy("host", "lh")
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
    )
    boiler = (
        freq.join(host_docs, "host")
        .where(
            (F.col("nd") >= F.lit(int(min_docs)))
            & (F.col("nd").cast("double") >= F.lit(float(min_frac)) * F.col("host_n"))
        )
        .select("host", "lh", F.lit(True).alias("is_boiler"))
    )
    marked = keyed.join(boiler, ["host", "lh"], "left").withColumn(
        "keep", F.col("is_boiler").isNull()
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("keep"), F.struct("idx", "ln")))
                    ),
                    lambda x: x["ln"],
                ),
                sep,
            ).alias("clean_text"),
        )
        .select("doc_id", "n_lines", "n_kept", "clean_text")
    )


def dedup_rate_by_group(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n_docs, n_unique, dup_rate) — per-source exact-duplicate
    pressure: n_unique counts DISTINCT normalized texts within the
    group, dup_rate = 1 - n_unique/n_docs (6dp). The governance view
    that decides which feeds get the expensive near-dup passes — a
    source shipping 40% byte-identical re-crawls gets triaged before
    MinHash ever runs.

    One aggregate on (group, text-md5) with map-side combine, then one
    group rollup — no joins, the 16-byte binary key from the exact-dedup
    path keeps shuffle bytes down.
    """
    from pagerank_spark.operators.textops import normalized_text

    norm = normalized_text(F.col(text_col))
    per_text = (
        docs.select(F.col(group_col).alias("grp"), F.unhex(F.md5(norm)).alias("_th"))
        .groupBy("grp", "_th")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    return per_text.groupBy("grp").agg(
        F.sum("_c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
    ).select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_unique",
        F.round(
            F.lit(1.0)
            - F.col("n_unique").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_rate"),
    )


def _positional_grams(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, sh) — every word n-gram with its 1-based token
    position, hashed with the shared 60-bit md5 primitive (the exact
    shingle_hashes formula, positions kept). Docs shorter than n carry
    no gram."""
    toks = f"split(lower({text_col}), ' ')"
    grams = F.expr(
        f"transform(sequence(1, size({toks}) - {n - 1}), i -> "
        f"named_struct('pos', i, 'g', concat_ws(' ', slice({toks}, i, {n}))))"
    )
    return (
        docs.where(F.expr(f"size({toks}) >= {n}"))
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("_pg"))
        .select(
            "doc_id",
            F.col("_pg.pos").cast("int").alias("pos"),
            hexint15(F.col("_pg.g")).alias("sh"),
        )
    )


def align_spans(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_a_col: str = "doc_a",
    doc_b_col: str = "doc_b",
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, run_grams, span_tokens) — the
    LONGEST aligned n-gram run between each candidate pair, with its
    1-based token offsets in both documents: the quotation/syndication
    detector that upgrades a set-overlap signal (ngram_jaccard /
    containment says "how much is shared") to an alignment ("WHERE and
    how long is the shared passage"). Lee et al. 2022's within-corpus
    dup_spans profiles substrings corpus-wide; this is its pairwise
    form over an explicit candidate list (feed it LSH/containment pairs).

    Shape: positional n-gram hashes (the shingle_hashes formula with
    positions kept) join the pair list — a candidate-bounded fan-out,
    never all-pairs — then the classic gaps-and-islands trick turns
    matched positions into runs: matches on one alignment DIAGONAL
    (pos_a - pos_b) with consecutive pos_a share (pos_a - row_number)
    inside a (pair, diagonal)-partitioned window, so the per-window sort
    is bounded by the shorter document, not the corpus. One rollup per
    island, one top-1 window per pair (run desc, then leftmost in a,
    then leftmost in b — deterministic). Pairs sharing no gram are
    absent from the output. ``span_tokens`` = run_grams + n - 1."""
    if n < 1:
        raise ValueError("n must be >= 1")
    g = _positional_grams(docs, n, text_col, id_col)
    p = pairs.select(
        F.col(doc_a_col).alias("doc_a"), F.col(doc_b_col).alias("doc_b")
    ).distinct()
    m = (
        p.join(
            g.select(
                F.col("doc_id").alias("doc_a"),
                F.col("pos").alias("pos_a"),
                "sh",
            ),
            "doc_a",
        )
        .join(
            g.select(
                F.col("doc_id").alias("doc_b"),
                F.col("pos").alias("pos_b"),
                "sh",
            ),
            ["doc_b", "sh"],
        )
        .select(
            "doc_a", "doc_b", "pos_a", "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("_diag"),
        )
    )
    w_isl = Window.partitionBy("doc_a", "doc_b", "_diag").orderBy("pos_a")
    runs = (
        m.withColumn("_grp", F.col("pos_a") - F.row_number().over(w_isl))
        .groupBy("doc_a", "doc_b", "_diag", "_grp")
        .agg(
            F.min("pos_a").cast("int").alias("start_a"),
            F.count(F.lit(1)).cast("long").alias("run_grams"),
        )
        .select(
            "doc_a", "doc_b", "start_a",
            (F.col("start_a") - F.col("_diag")).cast("int").alias("start_b"),
            "run_grams",
        )
    )
    w_top = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.desc("run_grams"), F.col("start_a"), F.col("start_b")
    )
    return (
        runs.withColumn("_rn", F.row_number().over(w_top))
        .where(F.col("_rn") == 1)
        .select(
            "doc_a", "doc_b", "start_a", "start_b", "run_grams",
            (F.col("run_grams") + F.lit(n - 1)).cast("long").alias("span_tokens"),
        )
    )
