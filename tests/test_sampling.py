"""Sampling / selection / curation operators (operators/sampling.py).

Correctness (vs pandas / union-find re-derivations) plus the scale
properties: stratified_sample is a shuffle-free pure filter, and the
top_k_per_group rank filter is rewritten to WindowGroupLimit so the shuffle
moves only each map task's local top-k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.sampling import (
    curate,
    interleave_shards,
    near_dup_clusters,
    stratified_sample,
    top_k_per_group,
    uniform01,
)


@pytest.fixture(scope="module")
def docs(spark):
    langs = ["en", "de", "fr", "zh"]
    rows = [(i, f"word{i % 7} text body {i}", langs[i % 4]) for i in range(2000)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"]).cache()


def test_uniform01_range_and_determinism(spark, docs):
    us = docs.select(uniform01(F.col("doc_id"), "s1").alias("u")).toPandas()["u"]
    assert (us >= 0).all() and (us < 1).all()
    again = docs.select(uniform01(F.col("doc_id"), "s1").alias("u")).toPandas()["u"]
    assert (us.values == again.values).all()
    other_seed = docs.select(uniform01(F.col("doc_id"), "s2").alias("u")).toPandas()["u"]
    assert (us.values != other_seed.values).any()


def test_stratified_sample_rates_and_default(spark, docs):
    rates = {"en": 0.5, "de": 0.1}
    out = stratified_sample(docs, rates, default_rate=0.02).toPandas()
    n = 500  # docs per stratum
    got = out.groupby("lang").size().to_dict()
    assert abs(got.get("en", 0) / n - 0.5) < 0.07
    assert abs(got.get("de", 0) / n - 0.1) < 0.05
    # fr/zh fall through to the default rate
    for lang in ("fr", "zh"):
        assert got.get(lang, 0) / n < 0.07
    # deterministic: same selection on re-run
    again = stratified_sample(docs, rates, default_rate=0.02).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_stratified_sample_is_pure_filter_no_shuffle(spark, docs):
    plan = (
        stratified_sample(docs, {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_top_k_per_group_matches_pandas(spark, docs):
    scored = docs.withColumn("score", (F.col("doc_id") * 37 % 101).cast("double"))
    out = top_k_per_group(scored, "lang", "score", k=3).toPandas()
    pdf = scored.toPandas()
    for lang, grp in pdf.groupby("lang"):
        expect = grp.sort_values(["score", "doc_id"], ascending=[False, True]).head(3)
        got = out[out["lang"] == lang].sort_values("rk")
        assert list(got["doc_id"]) == list(expect["doc_id"])
        assert list(got["rk"]) == [1, 2, 3]


def test_top_k_per_group_uses_window_group_limit(spark, docs):
    plan = (
        top_k_per_group(docs, "lang", "doc_id", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_interleave_shards_dense_and_balanced(spark, docs):
    out = interleave_shards(docs, n_shards=8).toPandas()
    assert len(out) == 2000
    assert set(out["shard"]) == set(range(8))
    for shard, grp in out.groupby("shard"):
        # pos is a dense 1..n_shard permutation within each shard
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
        # uniform hash: no shard is empty or hoards the corpus
        assert 150 < len(grp) < 350
    again = interleave_shards(docs, n_shards=8).toPandas()
    assert out.sort_values("doc_id")["shard"].tolist() == again.sort_values("doc_id")["shard"].tolist()


def test_near_dup_clusters_matches_union_find(spark):
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: (r["canonical_id"], r["is_dup"])
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert out == {
        1: (1, False),
        2: (1, True),
        3: (1, True),  # transitive: 3~2~1
        10: (10, False),
        11: (10, True),
        20: (20, False),  # singleton is its own canonical
    }


def test_curate_reasons_first_failing_stage(spark):
    en = "the quick value of the table is on the row and it is fast " * 8
    docs = spark.createDataFrame(
        [
            (1, en),                          # kept
            (2, en),                          # exact dup of 1 -> 'dup'
            (3, "le la et les des une " * 20),  # French markers -> 'lang'
            (4, "the of and in is it"),       # English but too short -> 'quality'
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["drop_reason"] for r in curate(docs, min_quality=0.3).collect()}
    assert out == {1: "kept", 2: "dup", 3: "lang", 4: "quality"}


def test_sampling_invariant_under_input_partitioning(spark, docs):
    # the (shard, pos) assignment and the stratified selection are pure
    # functions of (seed, doc_id) — physical layout of the input must not
    # change them (at cluster scale inputs arrive in arbitrary splits)
    base = interleave_shards(docs, n_shards=8).toPandas().sort_values("doc_id")
    shuffled_in = docs.repartition(13)
    again = interleave_shards(shuffled_in, n_shards=8).toPandas().sort_values("doc_id")
    assert base["shard"].tolist() == again["shard"].tolist()
    assert base["pos"].tolist() == again["pos"].tolist()

    s1 = sorted(stratified_sample(docs, {"en": 0.3}).toPandas()["doc_id"])
    s2 = sorted(stratified_sample(shuffled_in, {"en": 0.3}).toPandas()["doc_id"])
    assert s1 == s2


# ---------------------------------------------------------------------------
# sequence packing (pack_sequences)
# ---------------------------------------------------------------------------

def test_pack_sequences_is_concat_and_chunk(spark, docs):
    from pagerank_spark.operators.sampling import pack_sequences

    out = pack_sequences(docs, ctx_len=16, n_shards=4).toPandas()
    assert len(out) == 2000
    assert set(out["shard"].unique()) <= {0, 1, 2, 3}
    # replay each shard in (hash, doc_id) order: the running token stream
    # chunked at 16 must give exactly (seq_id, offset)
    import hashlib

    def h(i):
        return int(hashlib.md5(f"pack,{i}".encode()).hexdigest()[:15], 16)

    out["_h"] = out["doc_id"].map(h)
    for shard, grp in out.groupby("shard"):
        pos = 0
        for _, row in grp.sort_values(["_h", "doc_id"]).iterrows():
            assert row["seq_id"] == pos // 16
            assert row["offset"] == pos % 16
            pos += row["n_tokens"]
    # deterministic across invocations
    again = pack_sequences(docs, ctx_len=16, n_shards=4).toPandas()
    key = ["doc_id", "shard", "seq_id", "offset"]
    assert out[key].sort_values("doc_id").values.tolist() == \
        again[key].sort_values("doc_id").values.tolist()


def test_pack_sequences_nothing_dropped_nothing_padded(spark, docs):
    from pagerank_spark.operators.sampling import pack_sequences

    out = pack_sequences(docs, ctx_len=64, n_shards=2).toPandas()
    # the final doc of each shard ends exactly at the total token count:
    # sum(n_tokens) per shard == last doc's seq_id*64 + offset + n_tokens
    for shard, grp in out.groupby("shard"):
        total = grp["n_tokens"].sum()
        last = grp.sort_values(["seq_id", "offset"]).iloc[-1]
        assert last["seq_id"] * 64 + last["offset"] + last["n_tokens"] == total


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------

def test_temperature_rates_flatten_distribution():
    from pagerank_spark.operators.sampling import temperature_rates

    counts = {"en": 8000, "de": 1000, "fr": 100}
    flat = temperature_rates(counts, alpha=0.5, target_docs=1000)
    prop = temperature_rates(counts, alpha=1.0, target_docs=1000)
    # proportional sampling keeps rates equal across groups; alpha<1 must
    # upweight the tail (fr rate > en rate)
    assert abs(prop["en"] - prop["fr"]) < 1e-12
    assert flat["fr"] > flat["de"] > flat["en"]
    # expected sample size ~ target (no clamping binds here)
    exp = sum(flat[g] * n for g, n in counts.items())
    assert exp == pytest.approx(1000, rel=1e-9)


def test_temperature_rates_clamp():
    from pagerank_spark.operators.sampling import temperature_rates

    r = temperature_rates({"en": 1000, "rare": 2}, alpha=0.5, target_docs=900)
    assert r["rare"] == 1.0  # can't sample more than everything
    assert 0 < r["en"] <= 1.0


def test_temperature_sample_deterministic_and_sized(spark, docs):
    from pagerank_spark.operators.sampling import temperature_sample

    a = sorted(temperature_sample(docs, alpha=0.5, target_docs=400).toPandas()["doc_id"])
    b = sorted(temperature_sample(docs, alpha=0.5, target_docs=400).toPandas()["doc_id"])
    assert a == b
    # 4 equal-sized strata => temperature is a no-op vs proportional: ~400
    assert 300 <= len(a) <= 500


def test_temperature_joined_variant_matches_driver_bitexact(spark, docs):
    # round-4 item: the join-based high-cardinality variant must select the
    # IDENTICAL row set as the driver-collect variant — same weights, same
    # sorted-order normalizer, same half-even 12dp rounding, same md5
    # uniform — at alpha=0.5 (the sqrt fast path) AND a pow alpha
    from pagerank_spark.operators.sampling import (
        temperature_sample,
        temperature_sample_joined,
    )

    for alpha in (0.5, 0.7):
        drv = temperature_sample(docs, alpha=alpha, target_docs=300)
        jnd = temperature_sample_joined(docs, alpha=alpha, target_docs=300)
        assert drv.columns == jnd.columns
        a = sorted(map(tuple, drv.select("doc_id", "lang").collect()))
        b = sorted(map(tuple, jnd.select("doc_id", "lang").collect()))
        assert a == b and len(a) > 0, alpha


def test_temperature_dispatcher_flips_on_cardinality(spark, docs, monkeypatch):
    # the dispatcher: under the budget -> driver CASE-literal path (one
    # limit(budget+1) collect, filter pushes to the scan); over it -> the
    # join path, chosen WITHOUT collecting the group table
    from pagerank_spark.operators import sampling

    called = {"joined": 0}
    orig = sampling.temperature_sample_joined

    def spy(*a, **kw):
        called["joined"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(sampling, "temperature_sample_joined", spy)

    small = sampling.temperature_sample(docs, alpha=0.5, target_docs=300)
    assert called["joined"] == 0  # few langs: driver path
    big = sampling.temperature_sample(docs, alpha=0.5, target_docs=300,
                                      max_driver_groups=2)
    assert called["joined"] == 1  # 4 strata > budget of 2: join path
    assert sorted(r["doc_id"] for r in small.collect()) == \
           sorted(r["doc_id"] for r in big.collect())


def test_weighted_sample_matches_python_replay(spark, docs):
    import hashlib
    import math

    from pagerank_spark.operators.sampling import weighted_sample

    wdf = docs.withColumn("w", (F.col("doc_id") % 5 + 1).cast("double"))
    out = weighted_sample(wdf, k=7, weight_col="w", group_col="lang", seed="t1")
    got = {
        lang: [r["doc_id"] for r in rows]
        for lang, rows in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: (r["lang"], r["rk"])),
            key=lambda r: r["lang"],
        )
    }

    def key(i):
        u = int(hashlib.md5(f"t1,{i}".encode()).hexdigest()[:15], 16) / float(1 << 60)
        return (-math.log(u)) / float(i % 5 + 1)

    langs = ["en", "de", "fr", "zh"]
    for li, lang in enumerate(langs):
        ids = [i for i in range(2000) if i % 4 == li]
        want = [i for _, i in sorted((key(i), i) for i in ids)[:7]]
        assert got[lang] == want, lang


def test_weighted_sample_prefix_and_nonpositive(spark, docs):
    from pagerank_spark.operators.sampling import weighted_sample

    wdf = docs.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, 0.0).otherwise(3.5)
    )
    out = weighted_sample(wdf, k=9, weight_col="w", seed="t2").collect()
    assert len(out) == 9
    assert all(r["doc_id"] % 2 == 1 for r in out)  # zero-weight rows excluded
    # rk order is the sequential E-S selection: k'=4 is the k=9 prefix
    pre = weighted_sample(wdf, k=4, weight_col="w", seed="t2").collect()
    first4 = sorted(out, key=lambda r: r["rk"])[:4]
    assert sorted(r["doc_id"] for r in pre) == sorted(r["doc_id"] for r in first4)


def test_weighted_sample_favors_heavy_rows(spark, docs):
    from pagerank_spark.operators.sampling import weighted_sample

    # 20 heavy rows (w=1000) among 1980 light (w=1): they should dominate
    wdf = docs.withColumn(
        "w", F.when(F.col("doc_id") < 20, 1000.0).otherwise(1.0)
    )
    out = weighted_sample(wdf, k=25, weight_col="w", seed="t3").collect()
    heavy = sum(1 for r in out if r["doc_id"] < 20)
    assert heavy >= 18


def test_quantile_buckets_ties_and_boundaries(spark):
    from pagerank_spark.operators.sampling import quantile_buckets

    # 8 distinct values, k=4: two values per bucket, ties never split
    df = spark.createDataFrame(
        [(i, (i % 8) * 10) for i in range(64)], ["doc_id", "val"]
    )
    rows = quantile_buckets(df, "val", k=4, id_col="doc_id").collect()
    by_val = {}
    for r in rows:
        by_val.setdefault(r["val"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in by_val.values())
    assert {v: b.pop() for v, b in by_val.items()} == {
        0: 1, 10: 1, 20: 2, 30: 2, 40: 3, 50: 3, 60: 4, 70: 4
    }


def test_quantile_buckets_skewed_tie_block(spark):
    from pagerank_spark.operators.sampling import quantile_buckets

    # one value holding 90% of rows: its whole tie block lands in the
    # bucket of its cumulative fraction (ceil semantics), never split
    rows = [(i, 1) for i in range(90)] + [(90 + j, 2 + j) for j in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "val"])
    got = {r["doc_id"]: r["bucket"] for r in quantile_buckets(df, "val", k=10).collect()}
    assert all(got[i] == 9 for i in range(90))  # ceil(10*90/100) = 9
    assert got[99] == 10


def test_chunk_documents_windows_and_ragged_tail(spark):
    from pagerank_spark.operators.sampling import chunk_documents

    # 10 tokens, size 4, stride 3: starts 0,3,6 then ragged tail at 6?
    # (10-4)=6, 6%3==0 -> no tail; starts 0,3,6 cover tokens 0..9
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"]
    )
    rows = sorted(
        (r["chunk_id"], r["start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, size=4, stride=3).collect()
    )
    assert rows == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]
    # 11 tokens: (11-4)=7, 7%3=1 -> full-size tail anchored at 7
    docs2 = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))], ["doc_id", "text"]
    )
    rows2 = sorted(
        (r["chunk_id"], r["start"], r["n_chunk_tokens"])
        for r in chunk_documents(docs2, size=4, stride=3).collect()
    )
    assert rows2 == [(0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 7, 4)]


def test_chunk_documents_short_and_empty_doc(spark):
    from pagerank_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
           for r in chunk_documents(docs, size=8).collect()}
    assert got[1] == (0, 3, "only three tokens")
    # empty text splits to [''] — one 1-token chunk of the empty string
    assert got[2] == (0, 1, "")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, size=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=0)


def test_leakage_safe_split_clusters_never_straddle(spark):
    from pagerank_spark.operators.sampling import (
        leakage_safe_split,
        near_dup_clusters,
    )

    docs = spark.createDataFrame([(i,) for i in range(60)], ["doc_id"])
    # chains 0~1~2, 10~11; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
    )
    cl = near_dup_clusters(docs, pairs)
    out = leakage_safe_split(cl).collect()
    assert len(out) == 60
    by_canon = {}
    for r in out:
        by_canon.setdefault(r["canonical_id"], set()).add(r["split"])
    # every cluster maps to exactly one split
    assert all(len(v) == 1 for v in by_canon.values())
    # with 57 clusters all three splits should be populated
    assert {r["split"] for r in out} == {"train", "val", "test"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        leakage_safe_split(cl, train=0.9, val=0.2)


def test_concentration_report_hand(spark):
    import math

    from pagerank_spark.operators.sampling import concentration_report

    # 4 groups with counts 1,1,2,4 (n=8)
    rows = ([("a",)] + [("b",)] + [("c",)] * 2 + [("d",)] * 4)
    df = spark.createDataFrame(rows, ["source"])
    r = concentration_report(df).collect()[0]
    assert (r["n_groups"], r["n_items"]) == (4, 8)
    ps = [1 / 8, 1 / 8, 2 / 8, 4 / 8]
    ent = sum(round(-p * math.log2(p), 9) for p in ps)
    assert abs(r["entropy"] - round(ent, 6)) < 1e-9
    assert abs(r["norm_entropy"] - round(ent / 2, 6)) < 1e-6
    assert abs(r["hhi"] - round(sum(p * p for p in ps), 6)) < 1e-9
    # Gini with counts ascending 1,1,2,4: sum((2i-n-1)c)/(n*total)
    gn = sum((2 * i - 4 - 1) * c for i, c in enumerate([1, 1, 2, 4], 1))
    assert abs(r["gini"] - round(gn / (4 * 8), 6)) < 1e-9
    # uniform distribution: gini 0, norm_entropy 1
    u = spark.createDataFrame([(s,) for s in "abcd" * 5], ["source"])
    ru = concentration_report(u).collect()[0]
    assert ru["gini"] == 0.0 and ru["norm_entropy"] == 1.0
    # single group: norm_entropy NULL, entropy 0, hhi 1
    one = spark.createDataFrame([("x",)] * 6, ["source"])
    ro = concentration_report(one).collect()[0]
    assert ro["entropy"] == 0.0 and ro["norm_entropy"] is None
    assert ro["hhi"] == 1.0


# --- MAD robust outliers ----------------------------------------------------


def test_mad_outliers_hand_fixture(spark):
    from pagerank_spark.operators.sampling import mad_outliers

    # values: nine near 10, one wild 100 -> med 10, MAD 1
    vals = [10, 9, 11, 10, 12, 8, 10, 11, 9, 100]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["doc_id", "value"]
    )
    got = {r["doc_id"]: r for r in mad_outliers(df, "value").collect()}
    med, mad = 10, 1
    for i, v in enumerate(vals):
        want_rz = round(abs(v - med) / (1.4826 * mad), 6)
        assert got[i]["robust_z"] == want_rz, i
        assert got[i]["is_outlier"] == (want_rz > 3.5), i
    assert got[9]["is_outlier"] is True
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1


def test_mad_outliers_degenerate_mad_zero(spark):
    from pagerank_spark.operators.sampling import mad_outliers

    # > half the mass on one value -> MAD 0: NULL z, any deviation flags
    df = spark.createDataFrame(
        [(i, 5) for i in range(8)] + [(8, 7)], ["doc_id", "value"]
    )
    got = {r["doc_id"]: r for r in mad_outliers(df, "value").collect()}
    assert all(r["robust_z"] is None for r in got.values())
    assert got[8]["is_outlier"] is True
    assert all(not got[i]["is_outlier"] for i in range(8))


def test_mad_outliers_even_count_lower_median(spark):
    from pagerank_spark.operators.sampling import mad_outliers

    # n=4: lower median = value at cum >= ceil(2) -> 2nd smallest
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], ["doc_id", "value"]
    )
    got = {r["doc_id"]: r for r in mad_outliers(df, "value").collect()}
    # med = 2, devs = 1,0,1,2 -> MAD = lower-median(0,1,1,2) = 1
    assert got[0]["robust_z"] == round(1 / 1.4826, 6)
    assert got[3]["robust_z"] == round(2 / 1.4826, 6)


def test_dimensional_report_cube_subtotals(spark):
    from pagerank_spark.operators.sampling import dimensional_report

    rows = [
        ("en", "web", 10), ("en", "web", 20), ("en", "book", 30),
        ("de", "web", 40),
    ]
    df = spark.createDataFrame(rows, ["lang", "source", "n_chars"])
    got = {
        (r["lang"], r["source"]): r
        for r in dimensional_report(df).collect()
    }
    # cells: (en,web) (en,book) (de,web); lang subtotals: (en,N)(de,N);
    # source subtotals: (N,web)(N,book); grand total (N,N)
    assert len(got) == 3 + 2 + 2 + 1
    assert got[("en", "web")]["n_rows"] == 2
    assert got[("en", "web")]["total"] == 30
    assert got[("en", None)]["n_rows"] == 3
    assert got[("en", None)]["g_source"] == 1 and got[("en", None)]["g_lang"] == 0
    assert got[(None, "web")]["total"] == 70
    assert got[(None, None)]["n_rows"] == 4
    assert got[(None, None)]["mean"] == 25.0
    assert got[(None, None)]["g_lang"] == 1 and got[(None, None)]["g_source"] == 1
