"""Dataset reconciliation (operators/reconcile.py): row-level diff of two
table versions via slim (key, fingerprint) classification + differing-key
drill-down, cross-checked against a DuckDB full-outer-join oracle."""

import json
import os

import pytest
from pyspark.sql import functions as F

from unify_spark.operators.reconcile import reconcile_keys, reconcile_tables

_SCHEMA = "id string, v int, name string, score double"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


BASE = [
    ("a", 1, "alpha", 1.5),
    ("b", 2, "beta", 2.5),
    ("c", 3, "gamma", 3.5),
    ("d", 4, None, 4.5),
]


def test_identical_tables_reconcile(spark):
    left, right = _df(spark, BASE), _df(spark, BASE)
    report, evidence = reconcile_tables(left, right, ["id"])
    assert report.identical and evidence is None
    assert report.matching == 4 and report.n_left == report.n_right == 4
    assert report.compared_columns == ["v", "name", "score"]


def test_classification_and_column_evidence(spark):
    left = _df(spark, BASE)
    right = _df(
        spark,
        [
            ("a", 1, "alpha", 1.5),       # matching
            ("b", 2, "BETA", 2.5),        # differing: name
            ("d", 9, "delta", 4.5),       # differing: v AND name (null -> delta)
            ("e", 5, "eps", 5.5),         # only_right
        ],                                 # c dropped -> only_left
    )
    report, evidence = reconcile_tables(left, right, ["id"], table="t")
    assert not report.identical
    assert (report.only_left, report.only_right, report.differing, report.matching) == (1, 1, 2, 1)
    assert report.column_mismatches == {"name": 2, "v": 1}

    # observed = right/candidate value, expected = left/baseline value
    ev = {(r["key"], r["column"]): (r["observed"], r["expected"]) for r in evidence.collect()}
    assert ev[("b", "name")] == ("BETA", "beta")
    assert ev[("d", "v")] == ("9", "4")
    assert ev[("d", "name")] == ("delta", None)  # sentinel maps back to NULL
    assert all(c == "reconcile:t" for c in {r["constraint"] for r in evidence.collect()})

    # per-key classification frame agrees
    by = {r["id"]: r["status"] for r in reconcile_keys(left, right, ["id"]).collect()}
    assert by == {
        "a": "matching", "b": "differing", "c": "only_left",
        "d": "differing", "e": "only_right",
    }


def test_multiset_semantics_and_ambiguous_evidence(spark):
    """Duplicate keys are multisets: {A,A} vs {A} differs, and the
    xor-cancellation trap ({A,A} vs {B,B}) is caught by the SUM fingerprint;
    ambiguous within-side duplicates get key-grain evidence, column='*'."""
    a = ("x", 1, "one", 1.0)
    b = ("x", 2, "two", 2.0)
    left = _df(spark, [a, a, ("y", 1, "y", 0.0)])
    right_single = _df(spark, [a, ("y", 1, "y", 0.0)])
    report, _ = reconcile_tables(left, right_single, ["id"])
    assert report.differing == 1 and report.matching == 1

    right_bb = _df(spark, [b, b, ("y", 1, "y", 0.0)])
    report2, evidence2 = reconcile_tables(left, right_bb, ["id"])
    assert report2.differing == 1  # {A,A} vs {B,B} must NOT match
    stars = [r for r in evidence2.collect() if r["column"] == "*"]
    assert len(stars) == 1 and stars[0]["key"] == "x"

    # same multiset on both sides (two copies each) matches
    report3, _ = reconcile_tables(_df(spark, [a, a]), _df(spark, [a, a]), ["id"])
    assert report3.identical and report3.matching == 1


def test_float_digits_and_compare_cols(spark):
    left = _df(spark, [("a", 1, "n", 1.00000001)])
    right = _df(spark, [("a", 1, "n", 1.00000002)])
    exact, _ = reconcile_tables(left, right, ["id"])
    assert exact.differing == 1
    rounded, _ = reconcile_tables(left, right, ["id"], float_digits=6)
    assert rounded.identical

    only_v, _ = reconcile_tables(
        _df(spark, [("a", 1, "x", 0.0)]), _df(spark, [("a", 1, "y", 9.9)]),
        ["id"], compare_cols=["v"],
    )
    assert only_v.identical and only_v.compared_columns == ["v"]

    with pytest.raises(ValueError):
        reconcile_tables(left, right, ["id"], compare_cols=["nope"])
    with pytest.raises(ValueError):
        reconcile_tables(left.select("id"), right.select("id"), ["id"])


def test_null_keys_pair_null_safely(spark):
    left = _df(spark, [(None, 1, "n", 0.0)])
    right = _df(spark, [(None, 1, "n", 0.0)])
    report, _ = reconcile_tables(left, right, ["id"])
    assert report.identical and report.matching == 1


def test_reconcile_matches_duckdb_oracle(spark, tmp_path):
    """Classification counts over lineitem-shaped data cross-checked against
    a DuckDB full-outer-join oracle on the same parquet files."""
    import duckdb

    src = "/root/testdata/sf0.001/lineitem.parquet"
    left = spark.read.parquet(src).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    # deterministic mutation: drop some rows, perturb others
    key_mod = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 100
    right = (
        left.filter(key_mod != 0)  # ~1% only_left
        .withColumn(
            "l_quantity",
            F.when(key_mod == 1, F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
        )
        .withColumn(
            "l_returnflag",
            F.when(key_mod == 2, F.lit(None)).otherwise(F.col("l_returnflag")),
        )
    )
    lp, rp = str(tmp_path / "left.pq"), str(tmp_path / "right.pq")
    left.write.parquet(lp)
    right.write.parquet(rp)

    keys = ["l_orderkey", "l_linenumber"]
    got = {
        r["status"]: r["n"]
        for r in reconcile_keys(spark.read.parquet(lp), spark.read.parquet(rp), keys)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # the synthetic lineitem has DUPLICATE (orderkey, linenumber) keys, so
    # the oracle mirrors the engine's multiset-at-key-grain semantics:
    # per key, a sorted list of canonicalized row signatures (each engine
    # only decides equality internally — no cross-engine stringification
    # agreement needed)
    sig = (
        "coalesce(l_quantity::varchar,'\\0') || '|' || "
        "coalesce(l_extendedprice::varchar,'\\0') || '|' || "
        "coalesce(l_returnflag,'\\0')"
    )
    oracle = duckdb.connect().execute(
        f"""
        WITH l AS (SELECT l_orderkey, l_linenumber, count(*) n,
                          list_sort(list({sig})) s
                   FROM read_parquet('{lp}/*.parquet') GROUP BY 1, 2),
             r AS (SELECT l_orderkey, l_linenumber, count(*) n,
                          list_sort(list({sig})) s
                   FROM read_parquet('{rp}/*.parquet') GROUP BY 1, 2),
             j AS (
               SELECT CASE
                 WHEN r.n IS NULL THEN 'only_left'
                 WHEN l.n IS NULL THEN 'only_right'
                 WHEN l.n = r.n AND l.s = r.s THEN 'matching'
                 ELSE 'differing' END AS status
               FROM l FULL OUTER JOIN r
                 ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber
             )
        SELECT status, COUNT(*) n FROM j GROUP BY status
        """
    ).fetchall()
    want = {s: n for s, n in oracle}
    assert got == want and got.get("differing", 0) > 0 and got.get("only_left", 0) > 0

    # full report agrees with the keyed counts and finds the mutated columns
    report, _ = reconcile_tables(
        spark.read.parquet(lp), spark.read.parquet(rp), keys, details=True
    )
    assert report.differing == want["differing"]
    assert set(report.column_mismatches) == {"l_quantity", "l_returnflag"}


def test_reconcile_plan_is_slim(spark, tmp_path):
    """Phase-1 classification must not shuffle payload columns: the
    aggregate that feeds the full-outer join carries only key + count +
    fingerprint."""
    wide = spark.range(1000).select(
        F.col("id").cast("string").alias("k"),
        F.lit("x").alias("v"),
        F.expr("repeat('p', 1000)").alias("payload"),
    )
    keyed = reconcile_keys(wide, wide, ["k"])
    plan = keyed._jdf.queryExecution().optimizedPlan().toString()
    # the payload column is consumed by the hash projection below the
    # aggregate; it must not appear in any exchange-side attribute list
    after_agg = plan.split("Aggregate", 1)[0]
    assert "payload" not in after_agg


def test_cli_reconcile(spark, tmp_path, capsys):
    from unify_spark import cli

    lp, rp = str(tmp_path / "l.pq"), str(tmp_path / "r.pq")
    _df(spark, BASE).write.parquet(lp)
    _df(spark, BASE[:3] + [("d", 4, "CHANGED", 4.5)]).write.parquet(rp)

    ev = str(tmp_path / "evidence.pq")
    rc = cli.main(
        ["reconcile", "--left", lp, "--right", rp, "--keys", "id",
         "--table", "clips", "--out", ev]
    )
    rep = json.loads(capsys.readouterr().out)
    assert rc == 1 and rep["differing"] == 1 and rep["column_mismatches"] == {"name": 1}
    evr = spark.read.parquet(ev).collect()
    assert len(evr) == 1 and evr[0]["key"] == "d" and evr[0]["observed"] == "CHANGED"
    assert os.path.exists(ev)

    rc0 = cli.main(["reconcile", "--left", lp, "--right", lp, "--keys", "id"])
    rep0 = json.loads(capsys.readouterr().out)
    assert rc0 == 0 and rep0["identical"] is True
