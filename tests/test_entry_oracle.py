"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet at
sf0.001, compare row count + column names + (order-insensitive) values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame, name: str):
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    a, b = _normalize(sdf), _normalize(odf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].astype(float).to_numpy(), b[c].astype(float).to_numpy()
            ok = all(
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-6 * max(1, abs(x))
                for x, y in zip(av, bv)
            )
            assert ok, f"{name}: float column {c} mismatch"
        else:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), (
                f"{name}: column {c} mismatch"
            )


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    odf = ddb.execute(entry_mod.oracle_sql()[name]).df()
    _compare(sdf, odf, name)


def test_every_query_is_oracled():
    # The registry's contract: every queries() entry has an oracle_sql()
    # twin (the driver's strongest per-query check). If a genuinely
    # non-SQL-expressible query is ever registered, this pin should be
    # replaced with a rows-only run for it.
    assert ROWS_ONLY == [], f"queries without an oracle: {ROWS_ONLY}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
