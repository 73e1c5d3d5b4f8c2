"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares against
``oracle_sql()`` via DuckDB: row count, schema (column names + dtypes),
and order-insensitive exact value comparison.  Usage:

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            problems.append(f"dtype[{col}]: ray={a[col].dtype} sql={b[col].dtype}")
    if len(a) == len(b):
        for col in a.columns:
            try:
                eq = (a[col].values == b[col].values)
                neq = (~eq).sum()
            except Exception as e:
                problems.append(f"cmp[{col}]: {e}")
                continue
            if neq:
                idx = list((~eq).nonzero()[0][:3])
                examples = [(a[col].iloc[i], b[col].iloc[i]) for i in idx]
                problems.append(f"values[{col}]: {neq} mismatches, e.g. {examples}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"ERROR {name}: ray side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: {len(ray_df)} rows ({dt:.1f}s) [rows-only check]")
            continue
        try:
            sql_df = con.sql(sql).df()
        except Exception as e:
            print(f"ERROR {name}: oracle SQL raised: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({dt:.1f}s):")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(ray_df)} rows ({dt:.1f}s)")
    print("RESULT:", "PASS" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        logging_level="ERROR", ignore_reinit_error=True,
    )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass
    code = main()
    ray.shutdown()
    sys.exit(code)
