"""Self-check harness mimicking the driver's correctness gate:
runs every queries() entry and its oracle_sql() side-by-side, compares
row count, column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    os.environ["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + os.environ.get("PYTHONPATH", "")
    )
    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failed = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(mine)} rows)  [{dt:.1f}s]")
            continue
        try:
            ref = canon(con.sql(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            failed.append(name)
            continue
        if len(mine) != len(ref):
            print(f"FAIL  {name}: rows {len(mine)} vs {len(ref)}")
            failed.append(name)
            continue
        # align dtypes for comparison
        try:
            ref2 = ref.astype(mine.dtypes.to_dict())
        except Exception:
            ref2 = ref
        eq = mine.equals(ref2)
        if not eq:
            diff = (mine != ref2).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(mine)} differing rows")
            print("mine:\n", mine[diff].head(3))
            print("ref:\n", ref2[diff].head(3))
            failed.append(name)
        else:
            print(f"ok    {name}: {len(mine)} rows match  [{dt:.1f}s]")

    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all good")


if __name__ == "__main__":
    main()
