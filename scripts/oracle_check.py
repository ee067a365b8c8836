"""Driver-style oracle check at an arbitrary SF for selected queries.

Replicates tests/test_entry_oracle.py's comparison (row count, columns,
order-insensitive values) so restructured queries can be proven equivalent
at every local SF before shipping (optimization-round rule: prove
equivalence with the oracle when a query's physical plan changes).

Usage: python scripts/oracle_check.py --sf /root/testdata/sf0.01 [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        return [f"{name}: row count {len(sdf)} vs oracle {len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"]
    a, b = _normalize(sdf), _normalize(odf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].astype(float).to_numpy(), b[c].astype(float).to_numpy()
            ok = all(
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-6 * max(1, abs(x))
                for x, y in zip(av, bv)
            )
            if not ok:
                errs.append(f"{name}: float column {c} mismatch")
        elif a[c].astype(str).tolist() != b[c].astype(str).tolist():
            errs.append(f"{name}: column {c} mismatch")
    return errs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from unify_spark.session import get_spark, stop_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    names = args.queries or sorted(oracles)
    stop_spark()
    spark = get_spark("oracle-check")
    failures = []
    try:
        for name in names:
            sdf = entry_mod.queries()[name](spark, args.sf).toPandas()
            odf = con.execute(oracles[name]).df()
            errs = _compare(sdf, odf, name)
            print(f"[{'FAIL' if errs else 'ok'}] {name} rows={len(sdf)}", flush=True)
            failures.extend(errs)
    finally:
        stop_spark()
    for e in failures:
        print("FAIL:", e)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
