"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin side by side
over a testdata dir, compares row count / column names / sorted values, and
prints a per-query verdict. Run before every round so CORRECTNESS_r{N}.json
holds no surprises.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(va.dtype, np.floating) or np.issubdtype(vb.dtype, np.floating):
            va = va.astype(np.float64)
            vb = vb.astype(np.float64)
            if not np.array_equal(va, vb, equal_nan=True):
                return False
        else:
            if not (va == vb).all():
                return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = n_nooracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} QUERY-ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} no_oracle rows={len(res)}")
            n_nooracle += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        a, b = canon(res), canon(exp)
        cols_ok = list(a.columns) == list(b.columns)
        rows_ok = len(a) == len(b)
        vals_ok = cols_ok and rows_ok and values_equal(a, b)
        if vals_ok:
            print(f"{name:28s} PASS rows={len(a)}")
            n_pass += 1
        else:
            print(f"{name:28s} FAIL rows={len(a)}/{len(b)} cols_ok={cols_ok} "
                  f"ray_cols={list(a.columns)} sql_cols={list(b.columns)}")
            if cols_ok and rows_ok:
                for c in a.columns:
                    if not values_equal(a[[c]], b[[c]]):
                        diff = (a[c] != b[c])
                        print(f"   first diffs in {c}:")
                        print(pd.DataFrame({"ray": a[c][diff],
                                            "sql": b[c][diff]}).head(5))
                        break
            elif not rows_ok:
                merged = a.merge(b, how="outer", indicator=True,
                                 on=list(a.columns) if cols_ok else None)
                print(merged[merged["_merge"] != "both"].head(6))
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_nooracle}")
    ray.shutdown()


if __name__ == "__main__":
    main()
