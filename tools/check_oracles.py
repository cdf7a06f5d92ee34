"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf dir, compare
row count, schema (column names) and values (order-insensitive).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from pagerank_spark.session import get_spark


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c], downcast=None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracles")
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            failures.append(name)
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s spark, no oracle)")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        t0 = time.monotonic()
        try:
            odf = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            failures.append(name)
            continue
        t_duck = time.monotonic() - t0
        sn, on_ = normalize(sdf), normalize(odf)
        if list(sn.columns) != list(on_.columns):
            print(f"FAIL  {name}: columns spark={list(sn.columns)} oracle={list(on_.columns)}")
            failures.append(name)
            continue
        if len(sn) != len(on_):
            print(f"FAIL  {name}: rows spark={len(sn)} oracle={len(on_)}")
            failures.append(name)
            continue
        if not sn.equals(on_):
            neq = (sn != on_).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(sn)} rows differ; first diffs:")
            print(pd.concat([sn[neq].head(3), on_[neq].head(3)], keys=["spark", "oracle"]))
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(sn)} rows ({t_spark:.1f}s spark, {t_duck:.1f}s duck)")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
