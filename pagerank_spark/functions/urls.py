"""URL structure columns for web-corpus curation.

The reference treats urls as opaque strings (substring predicates only,
reference pagerank.py:196-242); large-scale curation additionally groups,
rates and caps by site — host/domain extraction and path shape are the
standard keys (per-domain quotas, domain-level dedup, boilerplate hosts).

All pure Column expressions (whole-stage codegen, no UDF), each with an
ANSI-SQL twin in __spark_entry__.py built from the same regexes:

  host       the authority minus scheme (RFC-3986-shaped: any-case scheme,
             optional userinfo@ stripped, :port and ?#-suffixes excluded)
  domain     the last two dot-labels of host (host itself if undotted) —
             a deterministic registrable-domain approximation (a real
             public-suffix list is a broadcast-joined lookup table away,
             deliberately not baked in)
  path       '/...' suffix after the authority ('' when absent)
  path_depth number of '/' in path (0 when no path)
  is_dir     url ends in '/' (the reference's regex filter targets these)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme per RFC 3986 (ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )), any case:
# a lowercase-only scheme class silently returns 'HTTP:' as the host for
# uppercase urls and folds ports into the domain rollup key
_SCHEME = r"(?:[A-Za-z][A-Za-z0-9+.-]*://)?"
HOST_RE = rf"^{_SCHEME}(?:[^/@?#]*@)?([^/:?#]+)"
PATH_RE = rf"^{_SCHEME}[^/?#]+(/[^?#]*)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"


def host_col(url: Column) -> Column:
    return F.regexp_extract(url, HOST_RE, 1)


def domain_col(url: Column) -> Column:
    h = host_col(url)
    d = F.regexp_extract(h, DOMAIN_RE, 1)
    return F.when(d == "", h).otherwise(d)


def path_col(url: Column) -> Column:
    return F.regexp_extract(url, PATH_RE, 1)


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add (host, domain, path, path_depth, is_dir) to ``df``."""
    u = F.col(url_col)
    p = path_col(u)
    return (
        df.withColumn("host", host_col(u))
        .withColumn("domain", domain_col(u))
        .withColumn("path", p)
        .withColumn(
            "path_depth", F.size(F.regexp_extract_all(p, F.lit("/"), 0)).cast("long")
        )
        .withColumn("is_dir", u.endswith("/"))
    )


def canonical_url_col(url: Column) -> Column:
    """Canonical dedup key for a crawled url: scheme/userinfo/port dropped
    (HOST_RE never captures them), host lowercased with a leading 'www.'
    stripped, query+fragment dropped (PATH_RE stops at [?#]), trailing
    slashes trimmed. Path CASE IS KEPT (paths are case-sensitive; only the
    authority is case-insensitive per RFC 3986 §6.2.2.1).

    Pure Column regexes — zero shuffle; keying an edge table or crawl
    frontier on this column is the standard dedup before graph build
    (http://www.x.test/a?utm=1 and X.TEST/a/ are the same page).
    """
    h = F.regexp_replace(F.lower(host_col(url)), r"^www\.", "")
    p = F.regexp_replace(path_col(url), r"/+$", "")
    return F.concat(h, p)


def canonical_url_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical, n_variants, keep_url) — url-level dedup rollup: every
    raw variant keyed by its canonical form, first-lexicographic kept. One
    partial-aggregated groupBy on the canonical key."""
    u = F.col(url_col)
    return (
        df.select(canonical_url_col(u).alias("canonical"), u.alias("raw"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min("raw").alias("keep_url"),
        )
    )


def domain_page_counts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_pages) — the per-site rollup quota/cap policies key on.
    One partial-aggregated groupBy; at corpus scale domains are the natural
    skew axis, and the map-side combine means even a 10^9-page domain adds
    one partial row per upstream partition to the shuffle."""
    return (
        df.select(domain_col(F.col(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_pages"))
    )
