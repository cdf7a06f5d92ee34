"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Large-scale training-data pipeline primitives, all pure JVM-side Column
expressions (whole-stage codegen; no Python in the hot path):

  * token statistics    — whitespace tokens + a BPE-ish regex token count
  * quality scoring     — length / punctuation / stopword-ratio composite
  * language ID         — marker-stopword n-gram heuristic, deterministic
  * document fingerprint — md5-based 60-bit content hash over normalized text

Every operator has a portable ANSI-SQL twin (DuckDB oracle) in
``__spark_entry__.py``; the hash primitive is the first 15 hex chars of md5
(60 bits, sign-safe in int64) so Spark `conv()` and DuckDB hex-cast agree
bit-for-bit.

The reference (laurenleadbetter/Pagerank) has no text layer beyond URL
substring predicates (pagerank.py:196-242); these operators extend the engine
to the document side of a web-corpus pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks
BPE_TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# generic high-frequency function words used by the quality score
QUALITY_STOPWORDS = (
    "the", "a", "of", "to", "and", "in", "is", "it", "that", "for", "on", "as",
)

# marker stopwords per language for the n-gram language-ID heuristic;
# alphabetical language order == deterministic tie-break order
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "en": ("the", "and", "of", "is", "that", "it"),
    "es": ("el", "los", "que", "las", "una", "por"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "zh": ("de0", "shi4", "le0", "zai4", "he2", "you3"),
}


def hexint15(col: Column) -> Column:
    """First 15 hex chars of md5 → int64 (60 bits; portable to DuckDB's
    ``('0x'||substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def normalized_text(col: Column) -> Column:
    """THE text-normalization used by every dedup key in the engine:
    lowercase, trim, collapse whitespace runs. Batch exact dedup, streaming
    dedup, fingerprints and curate all key on md5 of exactly this expression
    — byte-exact agreement across them is a correctness contract (and the
    DuckDB twins replicate it as
    ``regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')``)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def _ws_tokens(text: Column) -> Column:
    return F.split(text, " ")


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ws_tokens (whitespace token count), bpe_tokens (regex token count),
    n_chars. All JVM-side."""
    t = F.lower(F.col(text_col))
    return (
        docs.withColumn("ws_tokens", F.size(_ws_tokens(F.col(text_col))))
        .withColumn("bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), 0)))
        .withColumn("n_chars_computed", F.length(F.col(text_col)))
    )


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add stopword_ratio, punct_ratio, mean_word_len and a composite
    quality_score in [0,1] (rounded 6dp for cross-engine stability)."""
    toks = _ws_tokens(F.lower(F.col(text_col)))
    n_tok = F.size(toks)
    sw_list = ",".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_sw = F.expr(f"size(filter(split(lower({text_col}), ' '), t -> t IN ({sw_list})))")
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]"), 0))
    n_chars = F.length(F.col(text_col))
    out = (
        docs.withColumn("stopword_ratio", F.round(n_sw.cast("double") / n_tok, 6))
        .withColumn("punct_ratio", F.round(n_punct.cast("double") / n_chars, 6))
        .withColumn(
            "mean_word_len",
            F.round(F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("double") / n_tok, 6),
        )
    )
    # composite: length saturation * cleanliness * stopword presence
    score = (
        F.least(F.lit(1.0), F.log(1.0 + n_tok.cast("double")) / F.log(F.lit(1001.0)))
        * (F.lit(1.0) - F.col("punct_ratio"))
        * (F.lit(0.5) + F.lit(0.5) * F.col("stopword_ratio"))
    )
    return out.withColumn("quality_score", F.round(score, 6))


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add lang_pred: argmax marker-stopword count, ties broken by language
    code ascending; 'und' when no marker matches."""
    out = docs
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ",".join(f"'{m}'" for m in markers)
        c = f"_s_{lang}"
        out = out.withColumn(
            c, F.expr(f"size(filter(split(lower({text_col}), ' '), t -> t IN ({lst})))")
        )
        score_cols.append((lang, c))
    m = F.greatest(*[F.col(c) for _, c in score_cols])
    pred = F.when(m == 0, F.lit("und"))
    for lang, c in score_cols:  # alphabetical → deterministic tie-break
        pred = pred.when(F.col(c) == m, F.lit(lang))
    out = out.withColumn("lang_pred", pred)
    return out.drop(*[c for _, c in score_cols])


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add text_hash (md5 hex of normalized text) and fingerprint (60-bit
    int64). Normalization: lowercase, trim, collapse whitespace runs."""
    norm = normalized_text(F.col(text_col))
    return docs.withColumn("text_hash", F.md5(norm)).withColumn(
        "fingerprint", hexint15(norm)
    )


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop profile: token stats + quality + language + fingerprint."""
    out = with_token_stats(docs, text_col)
    out = with_quality_score(out, text_col)
    out = with_lang_id(out, text_col)
    out = with_fingerprint(out, text_col)
    return out


def repetition_stats(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_words, distinct_word_ratio, top_ngram_share,
    dup_ngram_frac) — Gopher/FineWeb-style intra-document repetition
    signals over word n-grams (``n`` defaults to trigrams):

      * distinct_word_ratio — |distinct words| / |words| (pure Column)
      * top_ngram_share     — occurrences of the doc's most frequent n-gram
                              over its total n-gram count ("fraction of
                              content in the most common n-gram")
      * dup_ngram_frac      — fraction of n-gram INSTANCES whose n-gram
                              occurs more than once ("fraction of content
                              inside duplicated n-grams")

    Boilerplate and spam score high on all three; a curation pipeline
    thresholds them (e.g. Gopher drops docs with top-2-gram share > 0.20).

    Scale shape: n-grams are hashed to 60-bit int64 BEFORE the frequency
    groupBy (8-byte shuffle keys, same design as dedup.shingle_hashes), the
    (doc_id, gram) count partial-aggregates map-side, and the per-doc rollup
    is a second partial-aggregated groupBy on doc_id alone — two exchanges
    total, both on compact keys, no Python anywhere. Ratios rounded 6dp for
    cross-engine stability (DuckDB twin in __spark_entry__.py)."""
    toks = _ws_tokens(F.lower(F.col(text_col)))
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), ' '), i, {n})))"
    )
    per_gram = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("_g"))
        .select("doc_id", hexint15(F.col("_g")).alias("gh"))
        .groupBy("doc_id", "gh")
        .agg(F.count("*").alias("c"))
    )
    rep = per_gram.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_ngram_share"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).cast("double")
            / F.sum("c"),
            6,
        ).alias("dup_ngram_frac"),
    )
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_words"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("distinct_word_ratio"),
    )
    return words.join(rep, "doc_id").select(
        "doc_id", "n_words", "distinct_word_ratio", "top_ngram_share", "dup_ngram_frac"
    )


def dup_line_stats(
    docs: DataFrame,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_char_frac) — Gopher's WITHIN-
    document duplicate-line rules (Rae et al. 2021 A1.1: "duplicate line
    fraction" and "duplicate line character fraction"), completing the
    repetition rule set next to the n-gram stats (repetition_stats) and the
    CROSS-corpus paragraph dedup (dedup.paragraph_dedup).

      * dup_line_frac — fraction of line INSTANCES whose exact line occurs
        more than once in the same document
      * dup_char_frac — fraction of characters living in such lines

    Scale shape (the repetition_stats design): lines hash to 60-bit int64
    BEFORE the (doc_id, line) frequency groupBy — 8-byte shuffle keys — and
    the per-doc rollup partial-aggregates on doc_id; two exchanges total,
    no Python. The separator is ``\\Q..\\E``-quoted for the regex split so
    metacharacter separators split on exactly the bytes given. Ratios are
    single IEEE divisions of exact longs, rounded 6 dp; both are 0.0 for a
    doc whose every line is empty (zero-char denominator).
    """
    pat = "\\Q" + sep + "\\E"
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), pat)).alias("ln"),
    )
    per = (
        lines.select(
            "doc_id", hexint15(F.col("ln")).alias("lh"), F.length("ln").alias("l")
        )
        .groupBy("doc_id", "lh")
        .agg(F.count(F.lit(1)).alias("c"), F.max("l").alias("ch"))
    )
    dup = F.col("c") > 1
    tot_chars = F.sum(F.col("c") * F.col("ch"))
    dup_chars = F.sum(F.when(dup, F.col("c") * F.col("ch")).otherwise(F.lit(0)))
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_lines"),
        F.round(
            F.sum(F.when(dup, F.col("c")).otherwise(F.lit(0))).cast("double")
            / F.sum("c"),
            6,
        ).alias("dup_line_frac"),
        F.when(tot_chars == 0, F.lit(0.0))
        .otherwise(F.round(dup_chars.cast("double") / tot_chars, 6))
        .alias("dup_char_frac"),
    )


def length_quantiles(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    probs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(group, n_docs, p50, p90, p99) — per-group document-length quantiles
    (whitespace tokens), the distribution summary every corpus report leads
    with (length filters are tuned off these tails).

    EXACT type-7 interpolated percentiles via Spark's ``percentile``
    aggregate — bit-identical to DuckDB's ``quantile_cont`` (probed: both
    compute rank p*(n-1) with the same lerp), so the oracle hash-matches
    without approximation. One partial-aggregated groupBy; exact percentile
    needs the group's values collected per reducer, which is fine for
    group-by-language/source cardinalities (use approx_percentile when
    grouping by a high-cardinality key instead)."""
    toks = F.size(_ws_tokens(F.lower(F.col(text_col)))).cast("double")
    plist = ", ".join(f"{p}D" for p in probs)
    qs = F.expr(f"percentile(_len, array({plist}))")
    out = docs.select(F.col(group_col).alias("grp"), toks.alias("_len")).groupBy(
        "grp"
    ).agg(
        F.count("*").alias("n_docs"),
        qs.alias("_q"),
    )
    cols = [
        F.round(F.element_at("_q", i + 1), 6).alias(f"p{int(p * 100)}")
        for i, p in enumerate(probs)
    ]
    return out.select("grp", "n_docs", *cols)


def unigram_logloss(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style perplexity proxy: (doc_id, n_tokens, bits_per_token)
    where bits_per_token is the doc's cross-entropy under the CORPUS
    unigram distribution — avg over token instances of
    -log2(count(token)/N). Low = common/natural text; high = rare-token
    garbage (the signal CCNet thresholds with a KenLM model, computed here
    self-contained from the corpus itself — no external LM).

    Plan shape: one explode of whitespace tokens → one map-side-combined
    vocabulary count (token-keyed; the vocabulary table is the shuffle —
    O(distinct tokens), with AQE handling stopword skew) → one token-keyed
    join back → one doc-keyed rollup with map-side combine. No Python, no
    driver-side vocabulary, no broadcast assumption (a web-scale vocab with
    junk tokens can be huge; Catalyst/AQE picks broadcast when it fits).

    Cross-engine float hygiene (the adamic_adar recipe): per-instance bits
    quantized ROUND((ln(N)-ln(c))/ln(2), 9) — a fixed expression tree over
    exact integers — then DECIMAL(28,9)-summed (order-independent), one
    final division rounded 6 dp.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_ws_tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    total = vocab.agg(F.sum("c").cast("long").alias("n"))
    bits = F.round(
        (F.log(F.col("n").cast("double")) - F.log(F.col("c").cast("double")))
        / F.log(F.lit(2.0)),
        9,
    ).cast("decimal(28,9)")
    scored = toks.join(vocab, "tok").crossJoin(total).select("doc_id", bits.alias("b"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        # decimal sum → double FIRST, then one IEEE division (decimal
        # division scale rules differ between engines; this tree doesn't)
        F.round(F.sum("b").cast("double") / F.count(F.lit(1)), 6).alias(
            "bits_per_token"
        ),
    )


def zipf_alpha(
    docs: DataFrame, c_min: int = 2, text_col: str = "text"
) -> DataFrame:
    """One-row Zipf/power-law fit of the corpus token-frequency
    distribution: (n_types, n_tail, alpha) — the Clauset-Shalizi-Newman
    continuous MLE ``alpha = 1 + n / Σ ln(c / (c_min − 1/2))`` over the
    token TYPES whose corpus frequency c ≥ c_min (the graphstats.py
    powerlaw_alpha recipe applied to the vocabulary instead of the degree
    table). Natural text sits near alpha ≈ 2 (Zipf's law); machine-
    generated or boilerplate-heavy corpora drift off it — the corpus-level
    sanity gauge next to the per-doc unigram_logloss score.

    Plan shape: one token explode → one map-side-combined vocabulary count
    (the unigram_logloss vocab) → one one-row aggregate. Per-type log terms
    are ROUND(…,9)-quantized then DECIMAL-summed — exact, order-independent
    — so the estimate is hash-stable across engines.
    """
    vocab = (
        docs.select(F.explode(_ws_tokens(F.lower(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    term = F.round(F.log(F.col("c") / (c_min - 0.5)), 9).cast("decimal(28,9)")
    s = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") >= c_min, 1).otherwise(0)).cast("long").alias("n_tail"),
        F.sum(F.when(F.col("c") >= c_min, term)).alias("slog"),
    )
    return s.select(
        "n_types",
        "n_tail",
        F.round(
            1.0 + F.col("n_tail").cast("double") / F.col("slog").cast("double"), 6
        ).alias("alpha"),
    )


def bigram_logloss(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram cross-entropy under the corpus's own bigram LM — the order-2
    step up from :func:`unigram_logloss` (the KenLM-style signal CCNet
    thresholds, self-contained): (doc_id, n_bigrams, bits_per_token) with
    bits = avg over bigram instances of -log2 p(w2|w1), where
    p(w2|w1) = c(w1,w2) / c(w1,·) — exact MLE over the corpus's bigram
    instances, no smoothing (every scored bigram exists in the LM by
    construction). Docs with fewer than 2 tokens have no bigrams and no row.

    Plan shape: bigram pairs are formed INSIDE the token array (one
    ``transform`` over a sliced copy — zero shuffle, no posexplode
    self-join), then ONE map-side-combined bigram count, a context rollup
    of that (bigram-table-sized input, not corpus-sized), and the join
    back + doc rollup. No Python, no driver-side vocabulary.

    Cross-engine float hygiene (the unigram recipe): per-instance bits
    ROUND((ln(c1)-ln(c2))/ln(2), 9) over exact BIGINTs, DECIMAL(28,9)-summed
    (order-free), one final division rounded 6 dp.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _ws_tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    bi = (
        toks.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks)-1),"
                    " (t, i) -> struct(t AS w1, toks[i+1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    big_counts = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    ctx = big_counts.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    bits = F.round(
        (F.log(F.col("c1").cast("double")) - F.log(F.col("c2").cast("double")))
        / F.log(F.lit(2.0)),
        9,
    ).cast("decimal(28,9)")
    scored = bi.join(big_counts, ["w1", "w2"]).join(ctx, "w1").select(
        "doc_id", bits.alias("b")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum("b").cast("double") / F.count(F.lit(1)), 6).alias(
            "bits_per_token"
        ),
    )


def readability(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch Reading Ease per document (Flesch 1948 — the classic
    text-difficulty score quality pipelines bucket corpora by):
    (doc_id, n_words, n_sentences, n_syllables, flesch) with

        flesch = 206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)

    Words are whitespace tokens (the engine's token convention), sentences
    are ``[.!?]+`` runs (min 1 so headline-only docs don't divide by zero),
    and syllables the standard vowel-group heuristic (``[aeiouy]+`` runs in
    the lowercased text — exact syllabification needs a dictionary; the
    vowel-group count is the usual corpus-scale stand-in).

    Pure Column expressions over ONE scan — zero shuffle, whole-stage
    codegen. Counts are exact BIGINTs; the score is a fixed IEEE expression
    tree over them (two divisions, two multiplies, two subtractions),
    identical in the DuckDB twin, rounded 6 dp. NULL when there are no
    words.
    """
    t = F.lower(F.col(text_col))
    n_words = F.size(_ws_tokens(t)).cast("long")
    n_sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_syllables = F.regexp_count(t, F.lit("[aeiouy]+")).cast("long")
    flesch = F.when(
        (n_words > 0) & (F.length(F.trim(F.col(text_col))) > 0),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_words.cast("double") / n_sentences.cast("double"))
            - F.lit(84.6) * (n_syllables.cast("double") / n_words.cast("double")),
            6,
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
        flesch.alias("flesch"),
    )


# Gopher document-level quality rules (Rae et al. 2021, appendix A1.1).
# The 8 "stop words" the rule counts DISTINCT membership of (>= 2 required):
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document filter (Rae et al. 2021 Table A1, doc-level
    rules): (doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, alpha_ratio, stop_hits, gopher_pass).

    Rules composed into ``gopher_pass``:
      * min_words <= n_words <= max_words
      * 3 <= mean word length <= 10
      * symbol-to-word ratio ('#' chars + '...' occurrences) < 0.1
      * < 90% of lines start with a bullet ('- ', '* ', '•')
      * < 30% of lines end with an ellipsis ('...' / '…')
      * >= 80% of words contain at least one letter
      * >= ``min_stop_hits`` distinct Gopher stop words present

    Everything is pure Column expressions over ONE scan — split arrays,
    array lambdas, replace-based substring counts — zero shuffle, full
    whole-stage codegen: the exact shape a 100-TB pre-training quality pass
    needs (this operator runs BEFORE dedup in a standard pipeline, so it
    sees every byte of the crawl).

    Cross-engine hygiene: each ratio is a single IEEE division rounded 6 dp
    and ``gopher_pass`` is evaluated on the ROUNDED ratios, so the verdict
    can never straddle an engine-specific ulp. Substring counts use
    non-overlapping left-to-right ``replace`` deltas — identical semantics
    in Spark and DuckDB.
    """
    t = F.col(text_col)
    toks = _ws_tokens(F.lower(t))
    n_words = F.size(toks).cast("long")
    mean_wl = F.round(
        F.length(F.regexp_replace(t, " ", "")).cast("double") / n_words, 6
    )
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#")))
    n_ellip = (F.length(t) - F.length(F.replace(t, F.lit("...")))) / F.lit(3)
    symbol_ratio = F.round((n_hash + n_ellip).cast("double") / n_words, 6)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_bullet = F.expr(
        f"size(filter(split({text_col}, '\\n'), l ->"
        " startswith(ltrim(l), '- ') OR startswith(ltrim(l), '* ')"
        " OR startswith(ltrim(l), '•')))"
    )
    n_ellip_end = F.expr(
        f"size(filter(split({text_col}, '\\n'), l ->"
        " endswith(rtrim(l), '...') OR endswith(rtrim(l), '…')))"
    )
    bullet_ratio = F.round(n_bullet.cast("double") / n_lines, 6)
    ellipsis_ratio = F.round(n_ellip_end.cast("double") / n_lines, 6)
    n_alpha = F.expr(
        f"size(filter(split(lower({text_col}), ' '), w -> w rlike '[a-z]'))"
    )
    alpha_ratio = F.round(n_alpha.cast("double") / n_words, 6)
    stop_hits = sum(
        F.when(F.array_contains(toks, w), 1).otherwise(0) for w in GOPHER_STOPWORDS
    ).cast("long")

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
    )
    gpass = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_ratio") < 0.9)
        & (F.col("ellipsis_ratio") < 0.3)
        & (F.col("alpha_ratio") >= 0.8)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return base.withColumn("gopher_pass", gpass)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns are written in the common subset of Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround, greedy quantifiers only —
# leftmost-first matching is identical in both engines on this subset.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# separator class is space-only (no \s: a greedy \s would merge unrelated
# digit runs across NEWLINES into one <PHONE>) and the run is length-bounded
# to the longest real-world dialable number (15 digits + separators)
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,18}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped numbers:
    (doc_id, n_emails, n_ips, n_phones, scrubbed).

    Counts are taken on the ORIGINAL text (all three patterns, independent);
    replacements apply sequentially email -> ip -> phone so the phone pattern
    can never re-match digits inside an already-redacted IP. Pure JVM-side
    regexp Column expressions — one scan, no shuffle, whole-stage codegen;
    this is the shape a 100-TB scrub pass must have (any Python crossing here
    would 10x the dominant cost of the pipeline).
    """
    t = F.col(text_col)
    # idx=0 == whole match: Spark defaults to capture group 1 and these
    # patterns deliberately have none (DuckDB's default IS group 0)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0))).cast("long")
    n_ips = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), F.lit(0))).cast("long")
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), F.lit(0))).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_IPV4_RE, "<IP>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def lexical_diversity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr, hapax_frac) — per-document
    lexical diversity: type-token ratio and the fraction of tokens that
    occur exactly once in the doc (hapax legomena). Low TTR flags
    templated/repetitive boilerplate the Gopher repetition rules catch
    at n-gram granularity; TTR catches it at the vocabulary level, and
    hapax-rate is the classic Zipf-head diagnostic. Same [a-z0-9]+
    tokenizer as the retrieval stack.

    Shape: sort_array once per doc, hapax counted by comparing each
    sorted position to its neighbors (a run of length 1) inside ONE
    filter lambda — pure Column expressions, one codegen'd scan, zero
    shuffle, zero Python (plan-audited). NULL ratios for token-free
    docs.
    """
    from pagerank_spark.operators.textsearch import tokens_col

    toks = tokens_col(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(toks).alias("_s"),
    ).select(
        "doc_id", "_s", F.size("_s").cast("long").alias("n_tokens")
    )
    hapax = F.size(
        F.expr(
            "filter(sequence(1, size(_s)), i -> "
            "(i = 1 OR _s[i - 1] <> _s[i - 2]) AND "
            "(i = size(_s) OR _s[i - 1] <> _s[i]))"
        )
    ).cast("long")
    n = F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_tokens",
        F.size(F.array_distinct("_s")).cast("long").alias("n_types"),
        F.when(n > 0, F.round(
            F.size(F.array_distinct("_s")).cast("double") / n.cast("double"), 6
        )).alias("ttr"),
        F.when(n > 0, F.round(
            hapax.cast("double") / n.cast("double"), 6
        )).alias("hapax_frac"),
    )


# Unicode script ranges (BMP-only, so UTF-16 Java regex and UTF-8 RE2 count
# the same code points). Priority order = tie-break order for the dominant
# script. The DuckDB twin writes the same ranges with RE2's \x{....} escapes.
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "a-zA-Z"),
    ("digit", "0-9"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("cjk", "一-鿿"),
    ("arabic", "؀-ۿ"),
    ("hangul", "가-힯"),
    ("devanagari", "ऀ-ॿ"),
)


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_latin, n_digit, n_cyrillic, n_greek, n_cjk, n_arabic,
    n_hangul, n_devanagari, n_chars, nonascii_frac, dominant_script) —
    per-document Unicode-script census: exact per-range code-point
    counts, the non-ASCII fraction, and the dominant script (max count,
    ties broken by SCRIPT_RANGES priority order; 'none' when no script
    character occurs). The script census is the multilingual-pipeline
    complement to the n-gram lang-ID heuristic (with_lang_id): lang-ID
    separates languages WITHIN a script, the census separates scripts —
    and mixed-script pages (Latin boilerplate around CJK body text, spam
    keyword stuffing across scripts) show up as split counts.

    All ranges are BMP so Java-regex (UTF-16) and RE2 (UTF-8) count the
    same code points. Pure Column expressions — one codegen'd scan, zero
    shuffle, zero Python; exact BIGINT counts, the one fraction is a
    single double division rounded to 6dp.
    """
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(f"[{rng}]")).cast("long")
        for name, rng in SCRIPT_RANGES
    }
    n_chars = F.length(t).cast("long")
    nonascii = F.regexp_count(t, F.lit(r"[^\x00-\x7F]")).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *[counts[name].alias(f"n_{name}") for name, _ in SCRIPT_RANGES],
        n_chars.alias("n_chars"),
        F.when(n_chars > 0, F.round(nonascii.cast("double") / n_chars, 6)).alias(
            "nonascii_frac"
        ),
    )
    mx = F.greatest(*[F.col(f"n_{name}") for name, _ in SCRIPT_RANGES])
    dom = F.when(mx == 0, F.lit("none"))
    for name, _ in SCRIPT_RANGES:
        dom = dom.when(F.col(f"n_{name}") == mx, F.lit(name))
    return base.withColumn("dominant_script", dom)


def tokenizer_fertility(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """(lang, n_docs, total_chars, total_ws_tokens, total_bpe_tokens,
    chars_per_bpe, bpe_per_ws) — per-language tokenizer fertility: how
    many BPE-ish tokens a whitespace word explodes into, and how many
    characters each token carries. THE multilingual tokenizer-budget
    diagnostic (languages with high fertility pay more sequence length
    per word — the practical reason multilingual vocabularies are
    rebalanced); read next to script_profile and vocab_coverage.

    One zero-join codegen'd scan computing the three exact counts per
    row, then ONE map-side-combined groupBy on the (tiny-cardinality)
    language key. Exact BIGINT sums; the two ratios are single rounded
    divisions (NULL when the denominator is 0)."""
    t = F.lower(F.col(text_col))
    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        F.size(_ws_tokens(F.col(text_col))).cast("long").alias("_ws"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), 0))
        .cast("long")
        .alias("_bpe"),
    )
    agg = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.sum("_ws").cast("long").alias("total_ws_tokens"),
        F.sum("_bpe").cast("long").alias("total_bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_chars",
        "total_ws_tokens",
        "total_bpe_tokens",
        F.when(
            F.col("total_bpe_tokens") > 0,
            F.round(
                F.col("total_chars").cast("double") / F.col("total_bpe_tokens"), 6
            ),
        ).alias("chars_per_bpe"),
        F.when(
            F.col("total_ws_tokens") > 0,
            F.round(
                F.col("total_bpe_tokens").cast("double")
                / F.col("total_ws_tokens"),
                6,
            ),
        ).alias("bpe_per_ws"),
    )
