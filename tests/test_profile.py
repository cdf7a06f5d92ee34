"""Data-quality profiling (operators/profile.py) hand fixtures."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pagerank_spark.operators.profile import table_profile, validate_expectations


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10),
            (2, "beta", 20),
            (3, None, 20),
            (4, "alpha", None),
        ],
        ["id", "name", "score"],
    )


def test_table_profile_hand(tbl):
    got = {r["column"]: r for r in table_profile(tbl).collect()}
    assert set(got) == {"id", "name", "score"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["id"]["n_nulls"] == 0 and got["id"]["n_distinct"] == 4
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "4"
    assert got["name"]["n_nulls"] == 1 and got["name"]["n_distinct"] == 2
    assert got["name"]["min_value"] == "alpha" and got["name"]["max_value"] == "beta"
    assert got["score"]["n_nulls"] == 1 and got["score"]["n_distinct"] == 2
    assert got["score"]["min_value"] == "10"


def test_table_profile_column_subset_and_empty(spark, tbl):
    got = {r["column"] for r in table_profile(tbl, ["id"]).collect()}
    assert got == {"id"}
    with pytest.raises(ValueError):
        table_profile(tbl, [])


def test_validate_expectations_hand(tbl):
    rules = [
        ("id_positive", F.col("id") > 0),
        ("name_not_null", F.col("name").isNotNull()),
        ("score_at_least_15", F.col("score") >= 15),
    ]
    got = {r["rule"]: r for r in validate_expectations(tbl, rules).collect()}
    assert got["id_positive"]["n_violations"] == 0
    assert got["id_positive"]["passed"] is True
    assert got["name_not_null"]["n_violations"] == 1
    assert got["name_not_null"]["violation_frac"] == 0.25
    # score >= 15: row1 fails (10), row4 NULL counts as violation
    assert got["score_at_least_15"]["n_violations"] == 2
    assert got["score_at_least_15"]["passed"] is False


def test_validate_expectations_rejects_empty(tbl):
    with pytest.raises(ValueError):
        validate_expectations(tbl, [])
