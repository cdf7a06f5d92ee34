"""Ranked text retrieval and corpus filtering over a documents table.

The reference is a web *search* engine (pagerank.py:175-242 ranks url
substring matches by PageRank); this module adds the text-relevance half a
real search stack pairs with it — an inverted index and BM25 ranked
retrieval — plus the two corpus filters every Common-Crawl-style pipeline
runs before training (C4 line/document heuristics, Raffel et al. 2020, and
a source blocklist).

Scale shapes (all pure DataFrame; no Python in any hot path):

  * ``postings`` / ``inverted_index`` — one regexp tokenize + explode, then
    ONE (term, doc_id)-keyed partial aggregate; the df/cf rollup is a second
    map-side-combined agg on the term key. Shuffle volume is O(total tokens)
    int64-hashable strings — the canonical "build the index" MapReduce job,
    and Spark's AQE coalesces the skewed stopword partitions.
  * ``bm25_topk`` — the query-term table is tiny and BROADCAST, so the
    corpus-side postings never move for the match; per-doc score sum is one
    partial agg and the top-k is TakeOrderedAndProject (no full sort).
  * ``c4_filter`` — per-line rules run inside array lambdas on each row
    (split → filter → array_join): one scan, zero shuffle, codegen'd.
  * ``blocklist_filter`` — broadcast LEFT ANTI join; the corpus side is one
    scan with the filter applied at the join, nothing wide.

Cross-engine float hygiene (same recipe as linkpred.py): each (doc, term)
BM25 contribution is ROUND(…, 9) then accumulated in DECIMAL(28,9) —
decimal addition is exact and order-independent, so Spark's partial-agg
tree and DuckDB's fold agree bit-for-bit; the emitted double is rounded to
6 dp like every float in the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenizer shared with the DuckDB twins: maximal [a-z0-9]+ runs over
# lowercased text (Java regex ∩ RE2 — identical matches in both engines).
TOKEN_RE = r"[a-z0-9]+"

BM25_K1 = 1.2
BM25_B = 0.75

# C4-style line rule: keep lines that end in terminal punctuation and have
# at least MIN_LINE_WORDS whitespace words (Raffel et al. 2020 §2.2).
C4_TERMINAL_RE = r'[.!?"]$'
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def tokens_col(text: Column) -> Column:
    """Array of lowercase [a-z0-9]+ tokens (DuckDB twin:
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting entries (term, doc_id, tf): one explode + one combine-side
    aggregate on the (term, doc_id) key."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dictionary-side index stats per term: (term, df, cf) — document
    frequency and collection frequency — for terms appearing in >= ``min_df``
    documents. Two stacked partial aggregates over the posting key; the
    term-keyed shuffle rows carry (string, long, long) only.
    """
    return (
        postings(docs, text_col=text_col, id_col=id_col)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .where(F.col("df") >= min_df)
    )


def anchor_term_index(anchors: DataFrame) -> DataFrame:
    """Anchor-text index per link target: (dst, term, tf, n_anchors) — term
    frequency across ALL anchor texts pointing at ``dst`` plus the target's
    total anchor count. Input is (src, dst, anchor) from
    functions/extract.py extract_anchors_df.

    This is the classic off-page relevance signal (Brin & Page 1998 §2.2:
    anchor text describes the TARGET better than the target describes
    itself); composed with BM25/PageRank it completes the engine's ranked
    retrieval with the signal the reference's substring-on-url predicate
    approximates.

    Scale shape: one explode of [a-z0-9]+ tokens (same tokenizer as the
    inverted index, so term vocabularies align) → one partial-aggregated
    groupBy on (dst, term) → the per-target anchor count joins on the dst
    key the aggregate already partitioned by. Shuffle = O(total anchor
    tokens) — anchor texts average a few words, so this is far below the
    page-content index cost; stopword-heavy anchors ("click here") skew the
    term key, which AQE's skew-join handles like the inverted index's.
    """
    per_term = (
        anchors.select("dst", F.explode(tokens_col(F.col("anchor"))).alias("term"))
        .groupBy("dst", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    n_anchors = anchors.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors")
    )
    return per_term.join(n_anchors, "dst").select(
        "dst", "term", "tf", "n_anchors"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval: top-``k`` (doc_id, n_matched, score) for the
    bag-of-words query, score descending then doc_id ascending.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (the Lucene non-negative form)
    s(d,t) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    The query-term list becomes a broadcast single-column table, so corpus
    postings are matched without moving; dl/avgdl/N ride in on one-row
    crossJoins (scalar subqueries in the twin). Per-(doc,term) scores are
    quantized to 9 dp and summed in DECIMAL — see module docstring.
    """
    spark = docs.sparkSession
    terms = sorted(set(query_terms))
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    post = postings(docs, text_col=text_col, id_col=id_col)
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        # SUM(long)/COUNT is one exact-int division in double: cross-engine safe
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_ = (
        post.join(F.broadcast(qdf), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )

    matched = (
        post.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * norm_tf, 9).cast("decimal(28,9)")
    scored = (
        matched.select("doc_id", contrib.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("s").alias("s_dec"),
        )
        .select(
            "doc_id",
            "n_matched",
            F.round(F.col("s_dec").cast("double"), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col("doc_id")).limit(k)


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional posting entries (doc_id, term, pos) — 0-based token
    positions, one row per token occurrence. The position-aware index
    phrase and proximity queries need (Lucene's positions stream); same
    tokenizer as :func:`postings` so the vocabularies align. One
    posexplode — shuffle only happens when a consumer aggregates."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    ).select("doc_id", "term", F.col("pos").cast("long").alias("pos"))


def phrase_topk(
    docs: DataFrame,
    phrase: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval over the positional index: top-``k``
    (doc_id, tf) where tf counts the phrase's start positions (overlapping
    matches each count — ["a","a"] in "a a a" has tf 2), tf descending
    then doc_id ascending.

    The classic positional-index intersection (Manning/IR ch. 2): term j
    of the phrase contributes its postings shifted to the candidate START
    s = pos - j, and a start survives iff every term produced it — m-1
    hash equi-joins on (doc_id, s). Each term's filter pushes into the
    posting scan, so only the phrase terms' postings ever shuffle
    (stopword-in-phrase skew lands on AQE like the index builds); the
    final count is one partial agg and the cut TakeOrderedAndProject.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [str(t) for t in phrase]
    post = positional_postings(docs, text_col=text_col, id_col=id_col)
    cur = (
        post.where(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").alias("s"))
    )
    for j, t in enumerate(terms[1:], start=1):
        pj = post.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - j).alias("s")
        )
        cur = cur.join(pj, ["doc_id", "s"])
    scored = cur.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    return scored.orderBy(F.desc("tf"), F.col("doc_id")).limit(k)


QL_MU = 2000.0


def ql_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    mu: float = QL_MU,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001; the Lucene ``LMDirichletSimilarity`` scoring): top-``k``
    (doc_id, n_matched, score) over docs matching >= 1 query term,
    score descending then doc_id ascending. Per matched term t:

        s(d,t) = ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu))
        p(t|C) = cf(t) / total_tokens

    — the language-model alternative to BM25's tf-idf saturation, and
    the second opinion ``rank_fusion`` wants from an independent scoring
    family. Same scale shape as ``bm25_topk``: broadcast query-term
    table (corpus postings never move for the match), collection stats
    ride one-row broadcast crossJoins, per-(doc,term) contributions are
    9dp-quantized and DECIMAL-summed (order-independent — Spark's
    partial-agg tree and the oracle's fold agree bit-for-bit), final
    top-k is TakeOrderedAndProject, never a full sort.
    """
    spark = docs.sparkSession
    terms = sorted(set(query_terms))
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    post = postings(docs, text_col=text_col, id_col=id_col)
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"),
    )
    total = dl.agg(F.sum("dl").cast("long").alias("total_tokens"))
    cf = (
        post.join(F.broadcast(qdf), "term")
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cf"))
    )

    matched = (
        post.join(F.broadcast(qdf), "term")
        .join(F.broadcast(cf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(total))
    )
    # p(t|C) as one exact-int division; both log terms in a fixed tree
    p_c = F.col("cf").cast("double") / F.col("total_tokens").cast("double")
    s = F.log(1.0 + F.col("tf").cast("double") / (mu * p_c)) + F.log(
        F.lit(mu) / (F.col("dl").cast("double") + mu)
    )
    contrib = F.round(s, 9).cast("decimal(28,9)")
    scored = (
        matched.select("doc_id", contrib.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("s").alias("s_dec"),
        )
        .select(
            "doc_id",
            "n_matched",
            F.round(F.col("s_dec").cast("double"), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col("doc_id")).limit(k)


def ranked_retrieval(
    bm25: DataFrame, ranks: DataFrame, rank_weight: float = 1.0
) -> DataFrame:
    """Compose text relevance with a link-authority prior (the full
    search-engine scoring the reference approximates with substring × rank,
    pagerank.py:175-192): combined = score * (1 + rank_weight * rank).

    ``ranks`` is any (doc_id, rank) vector — PageRank projected onto docs,
    quality scores, etc. Vertex-sized join; broadcast when small.
    """
    return bm25.join(ranks, "doc_id").select(
        "doc_id",
        "n_matched",
        "score",
        "rank",
        F.round(F.col("score") * (1.0 + rank_weight * F.col("rank")), 6).alias(
            "combined"
        ),
    )


RRF_K = 60  # Cormack, Clarke & Büttcher 2009's constant


def reciprocal_rank_fusion(
    ranked_lists: list[tuple[DataFrame, str]],
    k: int = RRF_K,
    top_k: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Büttcher 2009): combine
    several retrievers' CANDIDATE LISTS without score calibration —
    rrf(d) = Σ_lists 1/(k + rank_of_d_in_list). The standard way a search
    stack merges BM25, link-authority, and quality/semantic retrievers
    whose raw scores live on incomparable scales (ranked_retrieval's
    multiplicative blend needs a tuned weight; RRF needs none).

    ``ranked_lists`` is [(df, score_col), ...]; within each list rank is
    1-based by score DESC then id ASC. Returns (id_col, n_lists, rrf)
    ordered rrf DESC then id, cut to ``top_k`` when given.

    Scale contract: inputs are retriever OUTPUT lists — already cut to
    their own top-k upstream (bm25_topk, search, ann_topk are all k-sized)
    — so the per-list global row_number window runs over k rows, not the
    corpus; never feed a corpus-sized table. The fusion agg is one
    id-keyed partial agg over Σ list sizes rows. For deterministic
    cross-engine ranks, pre-round each score column (the callers' 6/9 dp
    convention); each 1/(k+r) contribution is 9dp-quantized and
    DECIMAL-summed so the fold order never shows.
    """
    from pyspark.sql import Window

    parts = []
    for df, score_col in ranked_lists:
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        parts.append(
            df.select(F.col(id_col), F.row_number().over(w).alias("_r"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = F.round(F.lit(1.0) / (F.lit(float(k)) + F.col("_r")), 9).cast(
        "decimal(28,9)"
    )
    fused = (
        u.select(id_col, contrib.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.sum("_c").alias("_s"),
        )
        .select(
            id_col,
            "n_lists",
            F.round(F.col("_s").cast("double"), 6).alias("rrf"),
        )
    )
    out = fused.orderBy(F.desc("rrf"), F.col(id_col))
    return out.limit(top_k) if top_k else out


def term_cooccurrence_pmi(
    docs: DataFrame,
    min_pair_count: int = 2,
    min_term_df: int = 1,
    max_term_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-level term co-occurrence with pointwise mutual information:
    (term_a, term_b, n_pairs, df_a, df_b, pmi), term_a < term_b,
    pmi = ln(N · c(a,b) / (df(a) · df(b))) over document frequencies —
    the standard distributional-association statistic (Church & Hanks 1990)
    a corpus pipeline uses for collocation mining and topic drift checks.

    Scale shape: the pair table is a doc_id-keyed self-join of the DISTINCT
    (doc, term) relation — O(Σ t_d²) where t_d is the doc's distinct-term
    count, a per-document constant, never corpus-quadratic. Two skew valves:

      * ``max_term_df`` drops stopword-grade terms BEFORE the self-join
        (a term in every document contributes N·(vocab) pairs of zero
        information — PMI ≈ 0 by construction — at enormous cost);
      * ``min_term_df``/``min_pair_count`` cut the long noise tail, which
        is also where PMI's low-count bias lives.

    The PMI itself is one double log of a ratio of exact BIGINTs — no
    summation anywhere, so cross-engine bit-stability needs no decimal
    machinery.
    """
    dterms = postings(docs, text_col=text_col, id_col=id_col).select(
        "term", "doc_id"
    )
    df_ = dterms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    keep = df_.where(F.col("df") >= min_term_df)
    if max_term_df is not None:
        keep = keep.where(F.col("df") <= max_term_df)
    kept = dterms.join(keep.select("term"), "term")
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    pairs = (
        kept.select("doc_id", F.col("term").alias("term_a"))
        .join(kept.select("doc_id", F.col("term").alias("term_b")), "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pair_count)
    )
    return (
        pairs.join(keep.select(F.col("term").alias("term_a"), F.col("df").alias("df_a")), "term_a")
        .join(keep.select(F.col("term").alias("term_b"), F.col("df").alias("df_b")), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_pairs",
            "df_a",
            "df_b",
            F.round(
                F.log(
                    F.col("n_pairs").cast("double")
                    * F.col("n_docs")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per group by tf-idf:
    (group, term, tf, df, score, pos) — tf is the term's total count inside
    the group, idf = ln(N_docs / df) over the whole corpus, score = tf·idf,
    pos the 1-based rank by (score DESC, term ASC).

    The per-host keyword report every crawl dashboard carries (what is this
    domain about? did its content drift after a re-crawl?).

    Scale shape: one explode → (group, term) partial-aggregated count (the
    inverted-index build keyed by group instead of doc); the corpus df table
    joins on the term key it is already partitioned by; the top-k is a
    group-partitioned row_number that lowers to WindowGroupLimit — rank
    truncation happens map-side, no global sort, no full materialized rank.
    The idf multiply is one double op on exact BIGINTs (no summation).
    """
    gtf = (
        docs.select(
            F.col(group_col).alias("group"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = inverted_index(docs, text_col=text_col, id_col=id_col).select("term", "df")
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        gtf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "group",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("group").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.select("*", F.row_number().over(w).alias("pos"))
        .where(F.col("pos") <= k)
    )


def c4_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020 §2.2), one codegen'd
    scan: (doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
    keep, clean_text).

    Line rule: keep lines ending in terminal punctuation [.!?"] with >= 5
    whitespace words. Document rule: drop docs containing "lorem ipsum" or
    a curly brace (code), or with < 3 sentence-final marks, or with no
    surviving lines. ``clean_text`` is the kept lines re-joined — what a
    pipeline would write; the flags are what it would monitor.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(l, " ")) >= C4_MIN_LINE_WORDS),
    )
    n_sentences = F.size(F.regexp_extract_all(t, F.lit(r"[.!?]"), 0)).cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    n_kept = F.size(kept).cast("long")
    keep = (
        (~has_lorem)
        & (~has_brace)
        & (n_sentences >= C4_MIN_SENTENCES)
        & (n_kept > 0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_term_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs weighted-cosine similarity join: (id_a, id_b, cosine) for
    document pairs whose tf-idf cosine >= ``threshold`` — the WEIGHTED
    near-dup/mirror detector next to the engine's set-based family
    (ngram_jaccard = unweighted overlap, minhash/simhash = sketches of it):
    two rewordings sharing their RARE vocabulary score high here even when
    their n-gram sets barely intersect (Bayardo-Ma-Srikant 2007's problem
    statement, with the candidate cap playing their threshold-based pruning
    role).

    Weights: idf = ln(N/df) (the tfidf_keywords formula), per-doc L2
    normalization, so cosine is the true unit-vector dot product.

    Candidate generation vs exact rescore (the ngram_jaccard contract):
    candidates come from the term inverted index with terms in more than
    ``max_term_df`` docs dropped FROM CANDIDATE GENERATION ONLY (a stopword
    shared by 10^6 docs would emit 10^12 pairs); the cosine itself is then
    the exact dot over ALL shared terms of the full normalized vectors, so
    a reported score is never approximate — the cap can only miss pairs
    whose every common term is hot (which at idf ~ 0 contribute little
    cosine anyway).

    Scale shape: term keys are 60-bit int64 hashes before every wide
    exchange (in-doc collisions sum weights — both engines share the hash,
    and a true hashed vector space does the same); tf, df are one explode +
    two stacked partial aggregates; norms one doc-keyed partial agg; the
    rescore is candidate-pairs joined to the two posting sides with hash
    equi-joins and one (id_a, id_b)-keyed partial-agg sum — traffic
    O(candidate pairs x doc terms), never all-pairs. Determinism recipe for
    the DuckDB twin: idf quantized 9 dp, per-(doc, hash) weights and
    per-term products 9dp-quantized then DECIMAL-summed (exact,
    order-independent), norm/division a fixed IEEE expression tree, final
    cosine ROUND 6 dp.
    """
    from pagerank_spark.operators.textops import hexint15

    p = postings(docs, text_col=text_col, id_col=id_col)
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    dfq = p.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf9 = F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 9)
    w9 = F.round(F.col("tf") * idf9, 9).cast("decimal(28,9)")
    wgt = (
        p.join(dfq, "term")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") < F.col("n_docs"))  # idf 0: no dot/norm effect
        .select(F.col("doc_id"), hexint15(F.col("term")).alias("th"), w9.alias("w9"))
        .groupBy("doc_id", "th")
        .agg(F.sum("w9").alias("w"))
    )
    wd = F.col("w").cast("double")
    nrm = wgt.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.round(wd * wd, 9).cast("decimal(28,9)")).cast("double")
        ).alias("nr")
    )
    u = wgt.join(nrm, "doc_id").select(
        "doc_id", "th", (wd / F.col("nr")).alias("u")
    )
    idx = u.select("th", "doc_id")
    if max_term_df is not None:
        tdf = idx.groupBy("th").agg(F.count(F.lit(1)).alias("_tdf"))
        idx = idx.join(
            tdf.where(F.col("_tdf") <= int(max_term_df)).select("th"), "th"
        )
    cand = (
        idx.select(F.col("th"), F.col("doc_id").alias("id_a"))
        .join(idx.select(F.col("th"), F.col("doc_id").alias("id_b")), "th")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ua = u.select(F.col("doc_id").alias("id_a"), "th", F.col("u").alias("ua"))
    ub = u.select(F.col("doc_id").alias("id_b"), "th", F.col("u").alias("ub"))
    dots = (
        cand.join(ua, "id_a")
        .join(ub, ["id_b", "th"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.round(F.col("ua") * F.col("ub"), 9).cast("decimal(28,9)")
            ).alias("s")
        )
    )
    return (
        dots.select(
            "id_a", "id_b", F.round(F.col("s").cast("double"), 6).alias("cosine")
        )
        .where(F.col("cosine") >= float(threshold))
    )


def blocklist_filter(
    docs: DataFrame, blocked: DataFrame, key_col: str = "source"
) -> DataFrame:
    """Drop documents whose ``key_col`` appears in the blocklist table
    (UT1-style domain/source blocking). Broadcast LEFT ANTI: the blocklist
    (10^5-10^6 rows in practice) ships to every executor once and the corpus
    side is a single scan — the only sane shape at 100 TB.
    """
    return docs.join(
        F.broadcast(blocked.select(key_col).distinct()), key_col, "left_anti"
    )


def vocab_growth(
    docs: DataFrame,
    bucket_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, n_docs, new_terms, cum_terms) — the corpus's vocabulary
    growth curve in ingestion order: bucket = doc_id DIV ``bucket_size``,
    ``new_terms`` = distinct terms whose FIRST occurrence falls in the
    bucket, ``cum_terms`` the running vocabulary size. Plotting cum_terms
    against cumulative tokens on log-log axes is the classic Heaps'-law
    diagnostic (V ~ k·Nᵝ) — the dedup/quality planners read it to see
    whether a crawl is still finding new language or re-crawling the
    same pages (the curve flattens).

    Scale shape: one token explode → a term-keyed partial-aggregated
    MIN(doc_id) (the only corpus-sized shuffle, map-side combined on the
    term key like the inverted index) → a bucket histogram (tiny) whose
    running sum is a window over #buckets rows, never row-sized. All
    exact integers — bit-identical cross-engine.
    """
    if bucket_size < 1:
        raise ValueError("bucket_size must be >= 1")
    from pyspark.sql import Window

    first = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("term")
        .agg(F.min("doc_id").cast("long").alias("_fs"))
    )
    newt = (
        first.groupBy((F.col("_fs") / bucket_size).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    ndocs = docs.groupBy(
        (F.col(id_col) / bucket_size).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ndocs.join(newt, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
        )
        .select(
            "bucket",
            "n_docs",
            "new_terms",
            F.sum("new_terms").over(w).cast("long").alias("cum_terms"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_word_count: int = 1,
) -> DataFrame:
    """(left, right, pair_count) — corpus-wide adjacent-character pair
    frequencies over the word vocabulary, i.e. the statistics of the
    FIRST merge step of byte-pair-encoding tokenizer training (Sennrich
    et al. 2016): each distinct word contributes its within-word
    character bigrams weighted by the word's corpus frequency, and the
    argmax pair is the first merge a BPE trainer would take. Running
    this over a 100 TB corpus is the "which tokenizer fits this data"
    probe; iterating merges needs the sequential merge loop (driver-side
    over the TINY pair table — the corpus is never re-scanned).

    Scale shape: one token explode + a term-keyed partial-aggregated
    word count collapses the corpus to its VOCABULARY (Heaps' law:
    ~10^7 rows at web scale), and every later step is vocabulary-sized:
    the character-pair explode multiplies by word length (<= ~20), the
    final (left, right) rollup is alphabet^2-sized. Words shorter than
    2 characters carry no pair. ``min_word_count`` prunes hapax noise
    before the pair explode. Exact BIGINT counts; same [a-z0-9]+
    tokenizer as the retrieval stack."""
    wc = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").cast("long").alias("_n"))
        .where(
            (F.char_length("_w") >= 2) & (F.col("_n") >= int(min_word_count))
        )
    )
    pairs = wc.select(
        F.col("_n"),
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(_w) - 1), i -> "
                "named_struct('l', substring(_w, i, 1), "
                "'r', substring(_w, i + 1, 1)))"
            )
        ).alias("_p"),
    )
    return (
        pairs.groupBy(
            F.col("_p.l").alias("left"), F.col("_p.r").alias("right")
        )
        .agg(F.sum("_n").cast("long").alias("pair_count"))
    )


def vocab_coverage(
    docs: DataFrame,
    thresholds: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
    text_col: str = "text",
) -> DataFrame:
    """(threshold, n_terms_kept, covered_instances, total_instances,
    coverage) — the vocabulary-truncation curve: for each min-count
    threshold, how many distinct terms survive and what fraction of all
    token INSTANCES they cover. The tokenizer/vocab sizing diagnostic
    (what OOV rate does a count-pruned vocabulary buy?) read together
    with vocab_growth (Heaps) and zipf_alpha: a power-law corpus covers
    ~all instances with a tiny high-count vocabulary.

    Scale shape: one token explode -> term-keyed partial-aggregated
    count (vocabulary-sized), then everything runs on the COUNT-VALUE
    HISTOGRAM (distinct count values — hundreds of rows at any corpus
    size): per-threshold sums are tiny filtered aggregates, never a
    vocabulary sort. Exact BIGINTs until the one rounded division."""
    for t in thresholds:
        if t < 1:
            raise ValueError("thresholds must be >= 1")
    tc = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    hist = tc.groupBy("_c").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    hist = hist.select(
        "_c", "_n", (F.col("_c") * F.col("_n")).cast("long").alias("_inst")
    ).localCheckpoint(eager=True)
    total = hist.agg(F.sum("_inst").cast("long").alias("total_instances"))
    outs = []
    for t in thresholds:
        kept = hist.where(F.col("_c") >= int(t)).agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_terms_kept"),
            F.coalesce(F.sum("_inst"), F.lit(0))
            .cast("long")
            .alias("covered_instances"),
        )
        outs.append(
            kept.crossJoin(F.broadcast(total)).select(
                F.lit(int(t)).alias("threshold"),
                "n_terms_kept",
                "covered_instances",
                "total_instances",
                F.when(
                    F.col("total_instances") > 0,
                    F.round(
                        F.col("covered_instances").cast("double")
                        / F.col("total_instances"),
                        6,
                    ),
                ).alias("coverage"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
