"""Table profiling + expectation validation — the data-quality gate a
100 TB ingest runs before anything downstream trusts the table (the
Deequ / great-expectations shape, expressed as plain aggregates):

  * ``table_profile``         — per-column null counts, distinct counts,
                                min/max in ONE pass over the table
  * ``validate_expectations`` — named boolean rules, per-rule violation
                                counts in ONE pass

Both collapse the corpus map-side: the profile is a single aggregate row
(5 aggregates per column) pivoted to per-column rows with ``stack``, the
validator one aggregate row with a violation counter per rule — no rule
or column adds a pass over the data. Exact BIGINT counts; the one
fraction is a rounded division.

Cross-engine notes: ``n_distinct`` ignores NULLs (SQL COUNT(DISTINCT)
semantics); min/max compute on the NATIVE type and cast to string for
the uniform report schema — exact for integer/string columns (the
contract substrate), engine-formatted for floats (documented caveat). A
rule that evaluates to NULL on a row (NULL propagation through the
predicate) counts as a VIOLATION — an expectation that cannot be shown
true is not satisfied.

The reference has no validation layer; this rounds out the corpus-ops
stack next to the composition reports (corpus_cube, concentration).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) — one
    row per profiled column, computed in a single pass."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"_nul{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"_dis{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max{i}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nul{i}, _dis{i}, _min{i}, _max{i}" for i, c in enumerate(cols)
    )
    return row.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def validate_expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """(rule, n_rows, n_violations, violation_frac, passed) — one row per
    named rule; a row violates a rule when the predicate is FALSE or
    NULL. All rules evaluate in one aggregate pass."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            F.count(F.when(~F.coalesce(pred, F.lit(False)), 1))
            .cast("long")
            .alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', _v{i}" for i, (name, _) in enumerate(rules))
    out = row.selectExpr(
        "_n AS n_rows",
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)",
    )
    return out.select(
        "rule",
        "n_rows",
        "n_violations",
        F.when(
            F.col("n_rows") > 0,
            F.round(F.col("n_violations").cast("double") / F.col("n_rows"), 6),
        ).alias("violation_frac"),
        (F.col("n_violations") == 0).alias("passed"),
    )
