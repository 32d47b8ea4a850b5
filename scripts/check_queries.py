"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` (DuckDB)
on the same parquet tables: row-count + schema + order-insensitive
value-hash with columns sorted by name.

Usage: python scripts/check_queries.py [--sf-dir DIR] [--only NAME]
Run from the repo root (Ray workers resolve modules via driver cwd).
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.6g").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to run")
    ap.add_argument("--skip", default=None,
                    help="comma-separated query names to skip (e.g. the "
                    "O(n^2) oracle twins at larger SFs)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(args.sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} cols={list(mine.columns)} "
                  f"[rows-only, no oracle] ({dt:.1f}s)")
            continue
        want = canon(con.sql(oracles[name]).df())
        ok_rows = len(mine) == len(want)
        ok_schema = list(mine.columns) == list(want.columns)
        ok_hash = value_hash(mine) == value_hash(want)
        if ok_rows and ok_schema and ok_hash:
            print(f"PASS {name}: rows={len(mine)} ({dt:.1f}s)")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(mine)} vs {len(want)}; "
                  f"schema {list(mine.columns)} vs {list(want.columns)}; hash_eq={ok_hash}")
            if ok_schema and not ok_hash:
                merged = mine.merge(want, indicator=True, how="outer")
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(10).to_string())
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
