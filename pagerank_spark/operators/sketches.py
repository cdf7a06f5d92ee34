"""Cardinality / frequency sketches with EXACT cross-engine contracts:
HyperLogLog distinct-count estimation (Flajolet et al. 2007) and the
count-min sketch (Cormode-Muthukrishnan 2005). Like the Bloom filter
(operators/bloom.py), these are approximate STRUCTURES with fully
deterministic CONTENTS — every register and counter derives from the
engine's shared 60-bit md5 primitive, so the DuckDB twins value-hash the
estimates themselves, approximation error and all.

Why sketches at 100 TB: COUNT(DISTINCT url) is a full shuffle of every
key; the HLL register table is m rows built by one map-side-combined
max — the standard cardinality probe for crawl-frontier growth, shard
sizing, and join-cardinality planning. The CMS answers "how often does
THIS key occur" for any key with O(d*w) memory and a guaranteed
overestimate — the heavy-hitter pre-filter in front of an exact top-k.

HLL bit layout (m = 2^b registers over the 60-bit hash): register =
h % m (low b bits), payload w = h >> b (60-b bits); rho = leading-zero
count of the payload + 1, computed EXACTLY via binary-string search
(instr(lpad(bin(w)), '1')) — no float log2 anywhere near a power of
two. The estimate's harmonic sum is scaled to an exact BIGINT
(sum of 2^(maxrho - rho_j)) so summation order cannot perturb it; the
final alpha*m^2/S is one fixed double expression.

The reference has no approximate layer; HyperBall (operators/
hyperball.py) already uses the same register discipline for
neighborhood functions — this exposes it as a standalone corpus
primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import hexint15

HLL_B = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_B
HLL_PAYLOAD_BITS = 60 - HLL_B  # 54
# Flajolet et al. 2007 alpha for m = 64
HLL_ALPHA = 0.709


def _rho(payload: Column, bits: int) -> Column:
    """1 + leading zeros of a ``bits``-wide payload, exactly: position of
    the first '1' in the zero-padded binary string; all-zero payload →
    bits + 1. bin() of an int64 has no leading zeros, so lpad restores
    the fixed width."""
    return F.when(payload == 0, F.lit(bits + 1)).otherwise(
        F.instr(F.lpad(F.bin(payload), bits, "0"), "1")
    )


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(reg, maxrho) — the HLL register table over the column's non-null
    values: one partial-aggregated MAX per register (the whole corpus
    collapses map-side to <= m rows per partition)."""
    h = hexint15(F.col(key_col).cast("string"))
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            (h % F.lit(HLL_M)).alias("reg"),
            # payload = h >> b: EXACT bit shift (h has 60 bits — a double
            # division would shave everything above 2^53)
            _rho(F.shiftright(h, HLL_B), HLL_PAYLOAD_BITS).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").cast("long").alias("maxrho"))
    )


def hll_distinct(df: DataFrame, key_col: str) -> DataFrame:
    """1-row (n_registers_hit, n_zero_registers, estimate,
    exact_distinct, rel_error) — the HLL cardinality estimate NEXT TO the
    exact distinct count (the calibration report shape, like
    dedup_agreement): readers see the estimate AND its realized error.
    The raw harmonic estimate applies m*ln(m/V) linear counting when
    E <= 2.5m and zero registers remain (the standard small-range
    correction)."""
    regs = hll_registers(df, key_col)
    # exact scaled harmonic sum: sum over ALL m registers of
    # 2^(PAYLOAD+1 - rho), rho = 0 rows counting as rho=0 -> 2^(P+1);
    # every term is an exact BIGINT, so is the sum
    pmax = HLL_PAYLOAD_BITS + 1
    term = F.pow(F.lit(2.0), F.lit(float(pmax)) - F.col("maxrho").cast("double"))
    s_hit = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.sum(term.cast("long")).cast("long").alias("_s_hit"),
    )
    exact = df.where(F.col(key_col).isNotNull()).agg(
        F.countDistinct(F.col(key_col)).cast("long").alias("exact_distinct")
    )
    out = s_hit.crossJoin(exact).select(
        F.col("n_hit").alias("n_registers_hit"),
        (F.lit(HLL_M) - F.col("n_hit")).cast("long").alias("n_zero_registers"),
        # zero registers contribute 2^(P+1-0); fixed double expression
        (
            F.lit(float(HLL_ALPHA))
            * F.lit(float(HLL_M))
            * F.lit(float(HLL_M))
            * F.lit(float(2**pmax))
            / (
                F.col("_s_hit")
                + (F.lit(HLL_M) - F.col("n_hit")) * F.lit(2**pmax)
            ).cast("double")
        ).alias("_raw"),
        F.col("exact_distinct"),
    )
    v = F.col("n_zero_registers")
    est = F.when(
        (F.col("_raw") <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(F.col("_raw"))
    return out.select(
        "n_registers_hit",
        "n_zero_registers",
        F.round(est, 6).alias("estimate"),
        "exact_distinct",
        F.when(
            F.col("exact_distinct") > 0,
            F.round(
                F.abs(F.round(est, 6) - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ),
        ).alias("rel_error"),
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """(row, pos, c) — the count-min counter table: depth md5 rows of
    ``width`` counters, one partial-aggregated count per cell. Cells
    never seen are absent (implicitly 0)."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (hexint15(F.concat(F.lit(f"cms{i},"), k)) % F.lit(width)).alias(
                    "pos"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(cells).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(key, estimate) — the count-min frequency estimate for every
    distinct probe key: min over the depth rows of the addressed
    counters (absent cell = 0). Always >= the true count; collisions
    only inflate, deterministically."""
    k = F.col("key")
    pr = (
        probes.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"),
                            (
                                hexint15(F.concat(F.lit(f"cms{i},"), k))
                                % F.lit(width)
                            ).alias("pos"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("_c"),
        )
        .select("key", F.col("_c.row").alias("row"), F.col("_c.pos").alias("pos"))
    )
    return (
        pr.join(F.broadcast(cms), ["row", "pos"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("estimate"))
    )
