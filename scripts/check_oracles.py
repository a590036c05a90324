"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry and its ``oracle_sql()`` twin
side-by-side at a given sf (default 0.01) and compares row count, column
names, and order-insensitive values (columns sorted by name, rows sorted
by all columns). Exit code 0 iff everything matches.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import os
import sys
import warnings

import duckdb
import pandas as pd


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"row count: got {len(got)} expected {len(exp)}")
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns: got {sorted(got.columns)} expected {sorted(exp.columns)}")
        return problems
    g, e = _canon(got), _canon(exp)
    if len(g) == len(e):
        for c in g.columns:
            gc, ec = g[c], e[c]
            try:
                same = gc.equals(ec) or (gc.astype(ec.dtype).equals(ec))
            except (TypeError, ValueError):
                same = list(gc) == list(ec)
            if not same:
                mism = [(i, gc.iloc[i], ec.iloc[i]) for i in range(len(g)) if gc.iloc[i] != ec.iloc[i]][:3]
                problems.append(f"column {c!r} values differ; first mismatches: {mism}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    warnings.filterwarnings("ignore")
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        got = _to_pandas(fn(sf_dir))
        if sql is None:
            print(f"  {name}: rows-only ({len(got)} rows)")
            continue
        exp = con.execute(sql).df()
        problems = compare(name, got, exp)
        if problems:
            failed.append(name)
            print(f"✗ {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name}: {len(got)} rows match")
    ray.shutdown()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL ORACLES MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
