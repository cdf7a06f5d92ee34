"""Deterministic Bloom filter build + membership probe (Bloom 1970) —
the broadcastable pre-filter a 100 TB pipeline puts in front of an
expensive anti-join: a blocklist / already-crawled set / dedup-seen set
is compressed to m bits, the probe side is filtered by k hash lookups
with NO false negatives, and only the (tiny) might-contain remainder
pays the exact join.

Determinism: bit positions are the engine's shared 60-bit md5 primitive,
h_i(key) = hexint15('bf{i},' || key) % m_bits — a pure function both
engines recompute inline, so even the FALSE POSITIVES are bit-identical
and the DuckDB twin can value-hash the whole verdict table (an
approximate data structure with an exact contract).

Representation: the built filter is the DataFrame of DISTINCT set bit
positions — at most m rows of one BIGINT, so a 10^9-bit filter is a
~1 GB broadcast in the degenerate all-set case and far less at sane fill
(the packed long[] bitmap is a constant-factor refinement the relational
form deliberately trades away for joinability; the probe is a broadcast
hash join either way). Build: one explode(k) + partial-aggregated
distinct over n*k 8-byte rows. Probe: explode(k) + broadcast semi-probe
+ one groupBy counting hits == k.

The reference has no set-membership layer; this backs blocklist /
decontaminate / frontier dedup style pre-filters at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15


def _positions(key, m_bits: int, k_hashes: int):
    return F.array(
        *[
            (hexint15(F.concat(F.lit(f"bf{i},"), key)) % F.lit(m_bits)).alias(
                f"_h{i}"
            )
            for i in range(k_hashes)
        ]
    )


def build_bloom(
    keys: DataFrame,
    key_col: str = "url",
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """(pos,) — the distinct set bit positions of the Bloom filter over
    ``keys``. NULL keys are ignored (they can never be probed equal)."""
    if m_bits < 1 or k_hashes < 1:
        raise ValueError("m_bits and k_hashes must be >= 1")
    return (
        keys.where(F.col(key_col).isNotNull())
        .select(
            F.explode(
                _positions(F.col(key_col).cast("string"), m_bits, k_hashes)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_might_contain(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str = "url",
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """(key, might_contain) — the Bloom verdict for every probe row:
    True iff ALL k bit positions are set. No false negatives; false
    positives at the usual (1 - e^(-kn/m))^k rate, deterministic given
    the key set. ``m_bits``/``k_hashes`` must match the build."""
    pr = (
        probes.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(_positions(F.col("key"), m_bits, k_hashes)).alias("pos"),
        )
    )
    hits = pr.join(
        F.broadcast(bits.select(F.col("pos"), F.lit(True).alias("_set"))),
        "pos",
        "left",
    )
    return (
        hits.groupBy("key")
        .agg(
            (F.count(F.when(F.col("_set"), 1)) == F.lit(k_hashes)).alias(
                "might_contain"
            )
        )
    )
