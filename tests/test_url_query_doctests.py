"""The reference's url_satisfies_query doctests (pagerank.py:203-218),
ported verbatim and enforced across all three implementations: pure Python,
Spark Column expression, and the DuckDB SQL twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

URL = "www.lawfareblog.com/covid-19-speech"

# (query, expected) — exactly the reference's doctest table
CASES = [
    ("covid", True),
    ("coronavirus covid", True),
    ("coronavirus", False),
    ("covid -speech", False),
    ("covid -corona", True),
    ("-speech", False),
    ("-corona", True),
    ("", True),
]


@pytest.mark.parametrize("query,expected", CASES)
def test_python_twin(query, expected):
    from pagerank_spark.functions.url_query import url_satisfies_query_py

    assert url_satisfies_query_py(URL, query) is expected


def test_column_expression(spark):
    from pagerank_spark.functions.url_query import url_satisfies_query_col

    df = spark.createDataFrame([(URL,)], ["url"])
    cols = [
        url_satisfies_query_col(F.col("url"), q).alias(f"c{i}")
        for i, (q, _) in enumerate(CASES)
    ]
    row = df.select(*cols).first()
    got = [bool(row[f"c{i}"]) for i in range(len(CASES))]
    assert got == [e for _, e in CASES]


def test_sql_twin():
    from pagerank_spark.functions.url_query import url_satisfies_query_sql

    con = duckdb.connect()
    for q, expected in CASES:
        pred = url_satisfies_query_sql("url", q)
        got = con.execute(f"SELECT {pred} FROM (SELECT '{URL}' AS url)").fetchone()[0]
        assert bool(got) is expected, q
