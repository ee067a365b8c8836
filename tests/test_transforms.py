"""Prepare-engine transform operators (SURVEY §2.2) + upsert crosscheck."""

import pytest
from pyspark.sql import functions as F

from unify_spark.operators import transforms as tr
from unify_spark.operators.base import ValidationContext
from unify_spark.operators.constraints import UpsertConflictConstraint


def test_select_rename(spark):
    df = spark.createDataFrame([("a", 1)], ["src_name", "x"])
    out = tr.select_rename(df, {"src_name": "name", "x": "count"})
    assert out.columns == ["name", "count"]


def test_cast_strict_captures_errors(spark):
    df = spark.createDataFrame([("1", "2.5"), ("oops", "3.0"), (None, "bad")], ["a", "b"])
    out = tr.cast_strict(df, {"a": "long", "b": "double"}).collect()
    assert out[0]["_cast_errors"] == []
    assert out[1]["_cast_errors"] == ["a:oops"]
    assert out[2]["_cast_errors"] == ["b:bad"]
    assert out[1]["a"] is None and out[1]["b"] == 3.0


def test_card_many_split(spark):
    df = spark.createDataFrame([("x;y;z",), ("solo",), ("",), (None,)], ["tags"])
    got = [r["tags"] for r in tr.card_many_split(df, "tags", ";").collect()]
    assert got == [["x", "y", "z"], ["solo"], [], []]


def test_card_many_split_regex_metachar(spark):
    # delimiter must be literal: '|' would be a regex alternation otherwise
    df = spark.createDataFrame([("a|b",)], ["v"])
    got = tr.card_many_split(df, "v", "|").collect()[0]["v"]
    assert got == ["a", "b"]


def test_molten(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], ["id", "m1", "m2"])
    out = tr.molten(df, ["id"], ["m1", "m2"]).collect()
    assert {(r["id"], r["variable"], r["value"]) for r in out} == {
        (1, "m1", 10.0),
        (1, "m2", 20.0),
    }


def test_constants_and_tuple(spark):
    df = spark.createDataFrame([("s1",)], ["sample"])
    out = tr.constants_injection(df, {"dataset": "ds1", "version": 2})
    out = tr.tuple_assembly(out, "uid_tuple", ["dataset", "sample"])
    row = out.collect()[0]
    assert row["dataset"] == "ds1" and row["version"] == 2
    assert row["uid_tuple"]["sample"] == "s1"


def test_melt_matrix_dense_drops_na(spark):
    df = spark.createDataFrame(
        [("r1", 1.0, None), ("r2", None, 4.0)], ["row_key", "c1", "c2"]
    )
    out = tr.melt_matrix_dense(df, ["row_key"], ["c1", "c2"])
    assert {(r["row_key"], r["col_key"], r["value"]) for r in out.collect()} == {
        ("r1", "c1", 1.0),
        ("r2", "c2", 4.0),
    }


def test_upsert_conflict(spark, audio_tables, manifest):
    """The V1 duplicate clips re-emit the same clip_id with a different codec
    → every dup key is a conflicting upsert."""
    c = UpsertConflictConstraint("clips", ["clip_id"], ["codec"])
    vio = c.violations(audio_tables, ValidationContext())
    keys = {r["key"] for r in vio.select("key").distinct().collect()}
    assert keys == set(manifest["uniqueness_clip_ids"])


def test_upsert_no_conflict_when_values_agree(spark):
    df = spark.createDataFrame(
        [("k1", "a"), ("k1", "a"), ("k2", "b")], ["id", "v"]
    )
    c = UpsertConflictConstraint("t", ["id"], ["v"])
    assert c.violations({"t": df}, ValidationContext()).count() == 0
