"""Local simulation of the driver's correctness gate.

Runs every ``queries()[name](sf_dir)`` and compares against
``oracle_sql()[name]`` via DuckDB: row count, column names (sorted), and
order-insensitive value comparison. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(mine.columns) != sorted(oracle.columns):
        problems.append(f"columns {sorted(mine.columns)} vs {sorted(oracle.columns)}")
        return problems
    for c in mine.columns:
        a, b = mine[c].dtype, oracle[c].dtype
        if str(a) != str(b):
            problems.append(f"dtype {c}: {a} vs {b}")
    if len(mine) != len(oracle):
        problems.append(f"rows {len(mine)} vs {len(oracle)}")
    a, b = canon(mine), canon(oracle)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
                if not np.array_equal(av, bv):
                    bad = np.nonzero(av != bv)[0]
                    mx = np.max(np.abs(av[bad] - bv[bad]))
                    problems.append(f"float col {c}: {len(bad)} diffs, max {mx:.3e}")
            else:
                if not (av == bv).all():
                    bad = int((av != bv).sum())
                    i = int(np.nonzero(av != bv)[0][0])
                    problems.append(f"col {c}: {bad} diffs, first at {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main() -> int:
    import logging

    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        import os

        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time as _time

    t_all = _time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = _time.perf_counter() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(mine)} rows [{dt:.2f}s]")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, mine, oracle)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: {len(mine)} rows match [{dt:.2f}s]")
    print(f"TOTAL {_time.perf_counter() - t_all:.1f}s")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
