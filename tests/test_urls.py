"""URL structure columns (functions/urls.py)."""

from __future__ import annotations

from pagerank_spark.functions.urls import domain_page_counts, with_url_parts

CASES = [
    # (url, host, domain, path, path_depth, is_dir)
    ("https://www.d3.test-p7/x/y", "www.d3.test-p7", "d3.test-p7", "/x/y", 2, False),
    ("http://example.com/", "example.com", "example.com", "/", 1, True),
    ("www.a.b.c.example.org/p", "www.a.b.c.example.org", "example.org", "/p", 1, False),
    ("HTTP://Example.com/x", "Example.com", "Example.com", "/x", 1, False),
    ("https://user@example.com:8080/a/b?q=/z", "example.com", "example.com", "/a/b", 2, False),
    ("s3a://bucket/key/part", "bucket", "bucket", "/key/part", 2, False),
    ("localhost/x", "localhost", "localhost", "/x", 1, False),
    ("plainhost", "plainhost", "plainhost", "", 0, False),
]


def test_url_parts_hand_cases(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], ["url"])
    got = {r["url"]: r for r in with_url_parts(df).collect()}
    for url, host, domain, path, depth, is_dir in CASES:
        r = got[url]
        assert r["host"] == host, url
        assert r["domain"] == domain, url
        assert r["path"] == path, url
        assert r["path_depth"] == depth, url
        assert r["is_dir"] == is_dir, url


def test_domain_page_counts(spark):
    urls = [
        "www.a.example.com/1",
        "www.b.example.com/2",
        "example.com/3",
        "other.net/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["domain"]: r["n_pages"] for r in domain_page_counts(df).collect()}
    assert got == {"example.com": 3, "other.net": 1}


def test_url_parts_no_udf_in_plan(spark):
    # pure Column expressions: the physical plan must contain no Python eval
    df = spark.createDataFrame([("a.b/c",)], ["url"])
    plan = with_url_parts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_canonical_url_rules(spark):
    from pagerank_spark.functions.urls import canonical_url_col
    from pyspark.sql import functions as F

    rows = [
        ("http://www.X.test/a?utm=1#f",),   # scheme+www+query+fragment
        ("HTTPS://user@X.TEST/a",),          # userinfo + host case
        ("x.test/a/",),                      # trailing slash
        ("x.test/A",),                       # path case KEPT (distinct)
        ("www.y.test",),                     # hostname only
    ]
    df = spark.createDataFrame(rows, ["raw"])
    got = [r["c"] for r in df.select(canonical_url_col(F.col("raw")).alias("c")).collect()]
    assert got == ["x.test/a", "x.test/a", "x.test/a", "x.test/A", "y.test"]


def test_canonical_url_groups_rollup(spark):
    from pagerank_spark.functions.urls import canonical_url_groups

    df = spark.createDataFrame(
        [("http://www.x.test/a",), ("x.test/a/",), ("x.test/b",)], ["url"]
    )
    got = {r["canonical"]: (r["n_variants"], r["keep_url"])
           for r in canonical_url_groups(df).collect()}
    assert got == {"x.test/a": (2, "http://www.x.test/a"), "x.test/b": (1, "x.test/b")}
