"""Host-level mirror detection: shingle-set resemblance between hosts.

A web crawl is full of mirrored sites (the same content served under many
hostnames); Bharat & Broder, "A technique for measuring the relative size
and overlap of public Web search engines" / "Mirror, mirror on the Web"
(WWW 1999) detect them by comparing per-host *content shingle sets* rather
than per-document fingerprints — a mirror rarely byte-matches (ads,
timestamps, relative links differ) but its shingle sets overlap massively.

``host_resemblance`` computes, for every host pair sharing at least
``min_common`` shingles:

    jaccard     = |A ∩ B| / |A ∪ B|
    containment = |A ∩ B| / min(|A|, |B|)   (catches a partial mirror of a
                                             much larger host)

over the hosts' DISTINCT word-``n``-gram 60-bit shingle hashes (the exact
machinery of operators/dedup.py — md5-derived int64 keys so the DuckDB
twin is bit-exact and every wide exchange moves 8-byte keys).

Scale shape at 10^7 hosts / 10^12 documents:

  * the (host, shingle) set is ONE explode + partial-aggregated distinct —
    shuffle O(total shingles) int64s;
  * candidate pairs come from the shingle-keyed self-join — linear in the
    truly shared content, never all-pairs of hosts;
  * ``max_shingle_hosts`` drops shingles present on more than that many
    hosts BEFORE the self-join (a boilerplate shingle on 10^5 hosts would
    emit 10^10 pairs — the same skew bomb dedup.py caps). The resemblance
    is then the exact Jaccard of the FILTERED sets (sizes are computed over
    the same filtered universe, so the ratio is a true Jaccard, not an
    underestimate of one) — the standard move: chrome/navigation shingles
    carry no mirroring evidence anyway.

The reference (laurenleadbetter/Pagerank) has no host layer; this extends
the hostgraph.py family to content space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15


def host_shingles(
    docs: DataFrame,
    n: int = 5,
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(host, sh) — the host's DISTINCT word n-gram 60-bit shingle hashes.
    One explode + one partial-aggregated distinct; hashing happens before
    the distinct so the exchange carries int64s. Documents shorter than n
    words contribute their whole text as one shingle (dedup.py convention).
    """
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), ' '), i, {n})))"
    )
    return (
        docs.select(F.col(host_col).alias("host"), F.explode(grams).alias("_s"))
        .select("host", hexint15(F.col("_s")).alias("sh"))
        .distinct()
    )


def _host_resemblance_plan(
    sh: DataFrame,
    min_common: int,
    max_shingle_hosts: int | None,
) -> DataFrame:
    """The lazy pair/score plan over a (host, sh) relation — split out so
    tests/test_plan_audits.py can audit the physical plan (the public
    operator eagerly checkpoints for cache hygiene, which hides it)."""
    if max_shingle_hosts is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_hdf"))
            .where(F.col("_hdf") <= max_shingle_hosts)
            .select("sh")
        )
        filtered = sh.join(hot, "sh")
    else:
        filtered = sh
    sizes = filtered.groupBy("host").agg(F.count(F.lit(1)).alias("n_sh"))
    a = filtered.select("sh", F.col("host").alias("host_a"))
    b = filtered.select("sh", F.col("host").alias("host_b"))
    inter = (
        a.join(b, "sh")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .where(F.col("common") >= min_common)
    )
    out = (
        inter.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n_sh").alias("n_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n_sh").alias("n_b")),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "common",
            "n_a",
            "n_b",
            F.round(
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("common").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )
    return out


def host_resemblance(
    docs: DataFrame,
    n: int = 5,
    min_common: int = 1,
    max_shingle_hosts: int | None = None,
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(host_a, host_b, common, n_a, n_b, jaccard, containment) for host
    pairs sharing >= ``min_common`` shingles, host_a < host_b.

    With ``max_shingle_hosts`` set, shingles on more than that many hosts
    are dropped from the universe first (see module docstring); sizes,
    intersection, and both ratios are all over the filtered universe, so
    the scores are exact set statistics of a well-defined set family.

    The (host, shingle) set feeds FOUR plan branches (hot-shingle filter,
    sizes, both self-join arms), so it is persisted for the run — the
    corpus-wide shingling pass executes once — and released before
    returning via checkpoint_release (the repo's report-operator
    cache-hygiene pattern; the pair-table output is data-sized).
    """
    from pagerank_spark.plans.caching import checkpoint_release

    sh = host_shingles(docs, n=n, host_col=host_col, text_col=text_col).persist()
    out = _host_resemblance_plan(sh, min_common, max_shingle_hosts)
    return checkpoint_release(out, [sh])
