"""Driver-gate simulation: run every queries() entry at sf0.001 and compare
against its oracle_sql() via DuckDB — row count, column names, and
order-insensitive values — the way the driver's CORRECTNESS check does."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_ORACLED)
def test_query_matches_oracle(ray_session, con, name):
    q = entry_mod.queries()[name]
    got = canonical(to_pandas(q(SF_DIR)))
    want = canonical(con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert all(
                (pd.isna(a) and pd.isna(b)) or math.isclose(a, b, abs_tol=1e-9)
                for a, b in zip(g, w)
            ), f"{name}.{col} float mismatch"
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), (
                f"{name}.{col} value mismatch"
            )


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(SQL_ORACLED))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    q = entry_mod.queries()[name]
    df = to_pandas(q(SF_DIR))
    assert df is not None
    # stable schema and non-crash; KG surfaces must be non-empty
    if name.startswith("kg_") or name in ("media_features", "dedup_simhash"):
        assert len(df) > 0, f"{name} returned no rows"


def test_entry_smoke(ray_session):
    res = entry_mod.entry()
    df = to_pandas(res)
    assert len(df) >= 0
    assert set(df.columns) == {"subj", "pred", "obj", "confidence", "n_occurrences"}
