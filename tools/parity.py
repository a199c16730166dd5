"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf dir, compare row count, schema
(column names) and order-insensitive values (columns sorted by name, rows
sorted by all columns). Usage:

    python tools/parity.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
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
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], pd.Timestamp):
            df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    inexact = []
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            if not np.allclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True):
                bad = int((~np.isclose(av.astype(float), bv.astype(float), atol=1e-9)).sum())
                return f"VALUES col={c} ({bad} mismatched)"
            # the driver hashes values exactly: a close-but-not-bit-equal
            # float column (or an int-vs-float dtype drift) is a latent
            # driver hash mismatch — surface it
            if (av.dtype != bv.dtype
                    or not np.array_equal(av.astype(float), bv.astype(float),
                                          equal_nan=True)):
                inexact.append(c)
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = int((av.astype(str) != bv.astype(str)).sum())
                i = int(np.argmax(av.astype(str) != bv.astype(str)))
                return (f"VALUES col={c} ({bad} mismatched; first ray={av[i]!r} "
                        f"sql={bv[i]!r})")
    if inexact:
        return f"OK-INEXACT cols={inexact}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    os.environ["METIS_RAY_ORACLE_SF"] = sf_dir   # golden paths follow scale
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            rdf = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        ray_s = time.time() - t0
        if name not in sqls:
            print(f"{name:28s} rows-only  rows={len(rdf)}  ({ray_s:.1f}s)")
            continue
        try:
            sdf = con.execute(sqls[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SQL-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, rdf, sdf)
        status = "ok " if verdict.startswith("OK") else "FAIL"
        if not verdict.startswith("OK"):
            failures += 1
        print(f"{name:28s} {status} rows={len(rdf)} ({ray_s:.1f}s) {verdict if verdict != 'OK' else ''}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
