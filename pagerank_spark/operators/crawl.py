"""Crawl-frontier prioritization: which UNCRAWLED pages to fetch next.

A crawler's edge log only has outlinks of pages it has already fetched; the
dangling destinations (never seen as ``src``) are the frontier. The classic
scheduling signal (Cho, Garcia-Molina & Page, WWW'98 "Efficient crawling
through URL ordering"; OPIC, Abiteboul et al. WWW'03) is expected PageRank
inflow: a frontier page linked from many high-rank crawled pages is worth
fetching first, because that inflow IS the rank mass the page would receive
in the next power iteration.

  * ``frontier_priority`` — priority(d) = alpha * Σ_{(s,d)∈E} weight(s,d) ·
    rank(s) over frontier pages d (weight = 1/outdeg, the LinkGraph
    convention, so this is exactly the dangling part of the next SpMV).
  * ``frontier_schedule`` — politeness-aware cut: top ``per_host`` frontier
    pages per host by priority (a crawler fetches at most a few URLs per
    host per cycle), ordered output with per-host positions.

Physical shape / 100-TB notes: the rank join is src-keyed (the same
partitioning the cached edge layout already has), the inflow aggregate is a
dst-keyed partial-agg exchange, and the frontier cut is a LEFT ANTI join
against the vertex-sized distinct-src table — no all-pairs anything, no
driver actions. The per-host cut lowers to WindowGroupLimit (each host
keeps <= per_host rows in the shuffle; plan-pinned). Per-term products are
9dp-quantized and DECIMAL-summed so priorities are independent of partial
aggregation order (the adamic_adar recipe).

The reference (laurenleadbetter/Pagerank) ranks a fixed crawl; this closes
the loop back to the crawler that produces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frontier_priority(
    edges: DataFrame,
    ranks: DataFrame,
    alpha: float = 0.85,
    weight_col: str = "weight",
    rank_col: str = "rank",
) -> DataFrame:
    """(url, priority, n_inlinks) for every frontier page (a ``dst`` that
    never appears as ``src``), priority = alpha * Σ weight·rank over its
    crawled in-neighbors — the page's share of the next iteration's rank
    mass. ``n_inlinks`` is its crawled in-degree (a cheap tie-breaking /
    spam-triage signal)."""
    srcs = edges.select(F.col("src").alias("url")).distinct()
    term = F.round(F.col(weight_col) * F.col(rank_col), 9).cast("decimal(38,9)")
    inflow = (
        edges.join(ranks.select(F.col("url").alias("src"), rank_col), "src")
        .groupBy(F.col("dst").alias("url"))
        .agg(
            F.sum(term).alias("_mass"),
            F.count(F.lit(1)).alias("n_inlinks"),
        )
    )
    return inflow.join(srcs, "url", "left_anti").select(
        "url",
        F.round(F.lit(alpha) * F.col("_mass").cast("double"), 6).alias("priority"),
        "n_inlinks",
    )


def frontier_schedule(
    edges: DataFrame,
    ranks: DataFrame,
    per_host: int = 2,
    alpha: float = 0.85,
    weight_col: str = "weight",
    rank_col: str = "rank",
) -> DataFrame:
    """(host, url, priority, host_pos) — the next crawl cycle's fetch list:
    the top ``per_host`` frontier pages per host by priority (politeness
    budget), host_pos = 1-based position within the host. Ties broken by
    url ascending (the engine-wide determinism contract)."""
    from pagerank_spark.functions.urls import host_col

    pri = frontier_priority(edges, ranks, alpha, weight_col, rank_col)
    hosted = pri.select(
        host_col(F.col("url")).alias("host"), "url", "priority", "n_inlinks"
    )
    hw = Window.partitionBy("host").orderBy(F.desc("priority"), F.col("url"))
    return (
        hosted.select("*", F.row_number().over(hw).alias("host_pos"))
        .where(F.col("host_pos") <= per_host)
        .select("host", "url", "priority", "host_pos")
    )


# ---------------------------------------------------------------------------
# robots.txt: parse per-host rule groups, filter the frontier through them
# ---------------------------------------------------------------------------

_DIRECTIVE_RE = r"^(?i)(user-agent|allow|disallow)\s*:\s*(.*?)\s*$"


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse one robots.txt body per host into the flat rule table
    (host, agent, allow, prefix, rule_len) — one row per
    (user-agent, Allow/Disallow path) pair, RFC 9309's group semantics:
    consecutive ``User-agent:`` lines share the group that the following
    Allow/Disallow lines populate; a ``User-agent:`` after a rule line
    starts a NEW group. Implemented subset (documented, deliberately the
    prefix-match core): comments (#…) stripped, directive names
    case-insensitive, agent names lowercased, empty-path rules dropped
    (RFC: "Disallow:" with no path disallows nothing); the * and $
    path wildcards are NOT interpreted — prefixes match literally
    (:func:`robots_allowed` is a pure prefix matcher).

    Scale shape: one split+posexplode per host doc, the group boundary a
    single lag/running-sum Window partitioned by host (robots bodies are
    KB-sized — the window is per-host-file, never corpus-wide), then one
    (host, group) equi-join expanding each group's agents × its rules.
    Input contract: at most one robots body per host.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "ln"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("ln"), r"#.*$", "")).alias("ln"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract(F.col("ln"), _DIRECTIVE_RE, 1)).alias("kind"),
        F.regexp_extract(F.col("ln"), _DIRECTIVE_RE, 2).alias("value"),
    ).where(F.col("kind") != "")
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.select(
        "host",
        "pos",
        "kind",
        "value",
        F.sum(
            F.when(
                (F.col("kind") == "user-agent")
                & (
                    F.coalesce(F.lag("kind").over(w), F.lit(""))
                    != "user-agent"
                ),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("gid"),
    )
    agents = (
        grouped.where(F.col("kind") == "user-agent")
        .select("host", "gid", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    rules = grouped.where(
        F.col("kind").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "gid",
        (F.col("kind") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
        F.length("value").cast("long").alias("rule_len"),
    )
    return agents.join(rules, ["host", "gid"]).select(
        "host", "agent", "allow", "prefix", "rule_len"
    )


def robots_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """(url, host, allowed, matched_prefix) — the crawl-frontier filter:
    each url checked against its host's robots rules for ``agent``.
    RFC 9309 resolution, prefix subset: the group is the exact
    (lowercased) agent match when the host defines one, else the ``*``
    group; among matching rules the LONGEST prefix wins and Allow beats
    Disallow at equal length; no matching rule — or no robots at all for
    the host — means allowed (matched_prefix NULL).

    Scale shape: host/path extraction is pure Column regex; the rule join
    is a host-keyed equi-join against a host-bounded rule table (broadcast
    when small); the winner cut is a url-partitioned row_number that
    lowers to WindowGroupLimit — rank truncation happens map-side, no
    global sort. Determinism: ties beyond (length, allow) break on prefix
    ascending.
    """
    from pagerank_spark.functions.urls import PATH_RE
    from pagerank_spark.functions.urls import host_col as _host

    fr = frontier.select(
        F.col(url_col).alias("url"),
        _host(F.col(url_col)).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col), PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    req = str(agent).lower()
    cand = rules.where(
        (F.col("agent") == req) | (F.col("agent") == "*")
    ).withColumn("spec", (F.col("agent") == req).cast("int"))
    has_spec = cand.groupBy("host").agg(F.max("spec").alias("_hs"))
    eff = cand.join(has_spec, "host").where(
        (F.col("spec") == 1) | (F.col("_hs") == 0)
    )
    hits = fr.join(eff, "host").where(
        F.col("path").startswith(F.col("prefix"))
    )
    uw = Window.partitionBy("url").orderBy(
        F.desc("rule_len"), F.desc("allow"), F.col("prefix")
    )
    winner = (
        hits.select("url", "allow", "prefix", F.row_number().over(uw).alias("_rn"))
        .where(F.col("_rn") == 1)
        .select("url", "allow", F.col("prefix").alias("matched_prefix"))
    )
    return fr.join(winner, "url", "left").select(
        "url",
        "host",
        F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        "matched_prefix",
    )


def change_rate(
    observations: DataFrame,
    id_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Per-page change-rate estimate from repeated crawl observations
    (Cho & Garcia-Molina 2003, "Estimating frequency of change"): each row
    is one fetch of ``id_col`` at ``ts_col`` with content fingerprint
    ``fp_col``; a change is two consecutive fetches with different
    fingerprints. Returns one row per page with >= 2 observations:

      (url, n_obs, n_changes, span_us,
       lambda_per_day = -ln((n - X + 0.5) / (n + 0.5)) / mean_interval_days)

    where n = n_obs - 1 intervals and X = n_changes — their bias-reduced
    MLE for a Poisson change process sampled at (roughly) regular
    intervals; the +0.5 terms keep X = n (changed every time) finite. This
    is THE re-crawl scheduling input: fetch frequency proportional to the
    estimated rate (recrawl_schedule below).

    Physical shape: ONE url-keyed exchange — the consecutive-pair change
    flags are a lag() window over (url) partitions and the per-page rollup
    reuses the same hash partitioning (no second exchange, the
    sessionization trick). Timestamps compare as exact unix_micros BIGINTs
    (ties broken by fingerprint so the pair order is total); counts are
    exact BIGINTs and lambda one fixed double expression tree, rounded 6dp.
    """
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(id_col).orderBy(F.col("_t"), F.col(fp_col))
    flagged = observations.select(
        F.col(id_col).alias("url"),
        t_us.alias("_t"),
        F.col(fp_col).alias(fp_col),
    ).select(
        "url",
        "_t",
        F.when(
            F.lag(fp_col).over(w).isNotNull()
            & (F.col(fp_col) != F.lag(fp_col).over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    )
    agg = flagged.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_chg").cast("long").alias("n_changes"),
        (F.max("_t") - F.min("_t")).cast("long").alias("span_us"),
    )
    n = (F.col("n_obs") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    # mean interval in days from the exact integer span; span_us > 0 guard
    # drops same-instant-only pages along with the single-observation ones
    interval_days = F.col("span_us").cast("double") / n / 86400.0e6
    lam = -F.log((n - x + 0.5) / (n + 0.5)) / interval_days
    return agg.where((F.col("n_obs") >= 2) & (F.col("span_us") > 0)).select(
        "url",
        "n_obs",
        "n_changes",
        "span_us",
        F.round(lam, 6).alias("lambda_per_day"),
    )


def recrawl_schedule(
    rates: DataFrame,
    budget: int,
    min_interval_days: float = 0.05,
    max_interval_days: float = 365.0,
) -> DataFrame:
    """Allocate a per-cycle fetch budget to the fastest-changing pages:
    the top ``budget`` pages by estimated change rate (ties by url), each
    with its suggested revisit interval 1/lambda clamped to
    [min_interval_days, max_interval_days] (never-changing pages get the
    max, hot pages the politeness floor) — the
    uniform-allocation-over-hot-pages policy that Cho & Garcia-Molina show
    dominates proportional-to-rate allocation. TakeOrderedAndProject cut;
    no global sort."""
    top = rates.orderBy(F.desc("lambda_per_day"), F.col("url")).limit(budget)
    # lambda = 0 (never observed changing) pins to the max — spelled as a
    # CASE, not 1/0, because ANSI mode raises on the division
    interval = F.when(
        F.col("lambda_per_day") <= 0, F.lit(max_interval_days)
    ).otherwise(
        F.least(
            F.lit(max_interval_days),
            F.greatest(
                F.lit(min_interval_days),
                F.lit(1.0) / F.col("lambda_per_day"),
            ),
        )
    )
    return top.select(
        "url",
        "lambda_per_day",
        F.round(interval, 6).alias("revisit_days"),
    )


# sitemap XML field patterns: non-greedy DOTALL blocks, whitespace-trimmed
# loc text (Java regex and DuckDB RE2 agree on all of these)
_SM_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_SM_IDX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_SM_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_SM_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_SM_PRIORITY_RE = r"(?s)<priority>\s*(.*?)\s*</priority>"


def _sm_decode(c):
    """Decode the five predefined XML entities (sitemap locs must escape
    & as &amp; etc. — sitemaps.org protocol). &amp; is decoded LAST so
    double-escaped text cannot cascade."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sitemap_entries(
    sitemaps: DataFrame,
    url_col: str = "sitemap_url",
    text_col: str = "body",
) -> DataFrame:
    """Parse sitemap XML bodies (sitemaps.org protocol) into the flat
    entry table (sitemap_url, loc, lastmod, priority, is_index) — one row
    per ``<url>`` entry of a urlset, or per ``<sitemap>`` entry of a
    sitemapindex (``is_index = true``; a crawler fetches those
    recursively). ``loc`` is entity-decoded and whitespace-trimmed;
    ``lastmod`` stays a string (W3C datetime, caller parses);
    ``priority`` try_casts to double (malformed -> NULL); entries without a non-empty ``<loc>`` are dropped.

    This closes the crawl-discovery loop next to robots_rules /
    meta_robots / canonical / redirects: sitemap locs minus already-
    crawled urls IS the seeded frontier, and ``priority``/``lastmod``
    feed recrawl_schedule's interval model.

    Scale shape: pure Column regexes — one codegen'd scan of the sitemap
    table, two JVM-side explodes (url-blocks, sitemap-blocks), zero
    Python, zero shuffle; sitemap files are capped at 50k entries by the
    protocol, so a block array is at most ~50k short strings.
    """
    base = sitemaps.select(
        F.col(url_col).alias("sitemap_url"), F.col(text_col).alias("_b")
    )
    out = []
    for block_re, is_index in ((_SM_URL_BLOCK_RE, False), (_SM_IDX_BLOCK_RE, True)):
        blocks = base.select(
            "sitemap_url",
            F.explode(
                F.regexp_extract_all(F.col("_b"), F.lit(block_re), 1)
            ).alias("_blk"),
        )
        out.append(
            blocks.select(
                "sitemap_url",
                _sm_decode(
                    F.regexp_extract(F.col("_blk"), _SM_LOC_RE, 1)
                ).alias("loc"),
                F.nullif(
                    F.regexp_extract(F.col("_blk"), _SM_LASTMOD_RE, 1), F.lit("")
                ).alias("lastmod"),
                F.nullif(
                    F.regexp_extract(F.col("_blk"), _SM_PRIORITY_RE, 1), F.lit("")
                ).try_cast("double").alias("priority"),
                F.lit(is_index).alias("is_index"),
            ).where(F.col("loc") != "")
        )
    return out[0].unionByName(out[1])


def allocate_budget(
    scores: DataFrame,
    budget: int,
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """(host, quota, alloc) — apportion an integer crawl ``budget`` across
    hosts proportionally to ``score`` by LARGEST-REMAINDER (Hamilton)
    rounding: quota = score/total*budget, every host gets floor(quota),
    and the leftover seats go to the largest fractional remainders
    (ties by host ascending). Σ alloc == budget exactly — the invariant
    a fetch scheduler needs (floor-only under-spends, naive rounding
    over/under-spends).

    Cross-engine determinism: scores are summed in DECIMAL (exact,
    order-independent — a double Σ would make `total` depend on partial-
    agg order), the quota double is then one fixed expression, and the
    remainder is 9dp-rounded before ranking so the seat cut can't
    straddle an ulp. The remainder rank is a global row_number over the
    HOST-sized table — hosts are ~100x fewer than pages (the hostgraph
    rollup ratio); this is the one operator in the crawl stack where a
    host-sized sort is the honest cost of an exact apportionment.
    Scores must be non-negative with a positive total.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    sc = scores.select(
        F.col(host_col).alias("host"),
        F.col(score_col).cast("double").alias("_s"),
    )
    tot = sc.agg(
        F.sum(F.col("_s").cast("decimal(38,9)")).cast("double").alias("_tot")
    )
    quota = F.col("_s") * F.lit(float(budget)) / F.col("_tot")
    based = sc.crossJoin(F.broadcast(tot)).select(
        "host",
        quota.alias("_q"),
        F.floor(quota).cast("long").alias("_base"),
        F.round(quota - F.floor(quota), 9).alias("_rem"),
    )
    leftover = based.agg(
        (F.lit(int(budget)) - F.sum("_base")).cast("long").alias("_r")
    )
    w = Window.orderBy(F.desc("_rem"), F.col("host"))
    return (
        based.crossJoin(F.broadcast(leftover))
        .select(
            "host",
            F.round("_q", 6).alias("quota"),
            (
                F.col("_base")
                + (F.row_number().over(w) <= F.col("_r")).cast("long")
            ).alias("alloc"),
        )
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap_url) — the ``Sitemap:`` directives of each host's
    robots.txt (RFC 9309 §2.3 / sitemaps.org discovery: the directive is
    group-independent, so it parses line-anchored regardless of
    User-agent blocks). Directive name case-insensitive, value trimmed,
    comments stripped first (a '# Sitemap: ...' line contributes
    nothing), one row per directive in document order kept as a set.
    Pure Column regex + one JVM explode — zero Python, zero shuffle;
    composes with :func:`sitemap_entries` to seed the frontier.
    """
    clean = F.regexp_replace(F.col(text_col), r"(?m)#.*$", "")
    urls = F.expr(
        f"regexp_extract_all(regexp_replace({text_col}, '(?m)#.*$', ''), "
        "'(?mi)^[ \\\\t]*sitemap[ \\\\t]*:[ \\\\t]*([^ \\\\t\\\\r\\\\n]+)', 1)"
    )
    _ = clean
    return (
        robots.select(
            F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url")
        )
        .where(F.col("sitemap_url") != "")
    )


_DELAY_DIRECTIVE_RE = r"^(?i)(user-agent|crawl-delay)\s*:\s*(.*?)\s*$"


def robots_crawl_delay(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay) — the de-facto ``Crawl-delay:`` politeness
    directive (not in RFC 9309 but honored by Bing/Yandex-class
    crawlers), resolved for ``agent`` with the same group semantics as
    :func:`robots_rules`: consecutive User-agent lines share the group,
    the exact (lowercased) agent's groups win over the ``*`` groups when
    the host defines any, multiple applicable delays collapse to the
    MINIMUM (the conservative schedule), non-numeric or negative values
    are ignored, hosts with no applicable delay are absent (caller
    defaults). Feeds :func:`frontier_schedule` / :func:`allocate_budget`
    as the per-host rate limit.

    Same shape as robots_rules: per-host-file line explode + one
    per-host Window for the group ids, then tiny group-keyed joins.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "ln"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("ln"), r"#.*$", "")).alias("ln"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(
            F.regexp_extract(F.col("ln"), _DELAY_DIRECTIVE_RE, 1)
        ).alias("kind"),
        F.regexp_extract(F.col("ln"), _DELAY_DIRECTIVE_RE, 2).alias("value"),
    ).where(F.col("kind") != "")
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.select(
        "host",
        "kind",
        "value",
        F.sum(
            F.when(
                (F.col("kind") == "user-agent")
                & (
                    F.coalesce(F.lag("kind").over(w), F.lit(""))
                    != "user-agent"
                ),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("gid"),
    )
    agents = (
        grouped.where(F.col("kind") == "user-agent")
        .select("host", "gid", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    delays = grouped.where(F.col("kind") == "crawl-delay").select(
        "host", "gid", F.col("value").try_cast("double").alias("delay")
    ).where(F.col("delay") >= 0)
    req = str(agent).lower()
    cand = agents.where(
        (F.col("agent") == req) | (F.col("agent") == "*")
    ).withColumn("spec", (F.col("agent") == req).cast("int"))
    has_spec = cand.groupBy("host").agg(F.max("spec").alias("_hs"))
    eff = cand.join(has_spec, "host").where(
        (F.col("spec") == 1) | (F.col("_hs") == 0)
    )
    return (
        eff.join(delays, ["host", "gid"])
        .groupBy("host")
        .agg(F.min("delay").alias("crawl_delay"))
    )


def url_trap_templates(
    urls: DataFrame,
    url_col: str = "url",
    trap_threshold: int = 100,
) -> DataFrame:
    """(template, n_urls, sample_url, is_trap) — URL-template mining for
    crawler-trap detection (the Heritrix/Nutch "infinite calendar"
    problem): every digit run in the url collapses to 'D', so
    ``/cal/2024/01/03`` and ``/cal/1997/12/31`` share the template
    ``/cal/D/D/D``, and a template whose DISTINCT-url count explodes is a
    parameterized page generator the frontier should cap, not crawl out.
    ``sample_url`` is the MIN url of the template (deterministic), the
    canonical representative a scheduler keeps.

    Scale shape: one pure-Column template projection (no Python) and ONE
    partial-aggregated groupBy on the template key — the count and the
    min combine map-side, so even a trap with 10^9 member urls ships one
    row per partition. Exact BIGINT counts; threshold compare on the
    exact integer."""
    if trap_threshold < 1:
        raise ValueError("trap_threshold must be >= 1")
    t = F.regexp_replace(F.col(url_col), "[0-9]+", "D")
    return (
        urls.where(F.col(url_col).isNotNull())
        .select(t.alias("template"), F.col(url_col).alias("u"))
        .distinct()
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("u").alias("sample_url"),
        )
        .withColumn("is_trap", F.col("n_urls") >= F.lit(int(trap_threshold)))
    )
