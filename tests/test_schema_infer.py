"""Schema/metamodel inference + constraint compilation round-trip."""

import pytest
from pyspark.sql import functions as F

from unify_spark.schema import Metamodel, infer_kind_schema, to_struct_type
from unify_spark.schema.infer import infer_metamodel
from unify_spark.schema.model import composite_id, context_uid, hashed_uid
from unify_spark.plans.compile import compile_constraints, kind_order


def test_infer_clips_schema(spark, audio_tables):
    ks = infer_kind_schema(audio_tables["clips"], "clips", partition_attr="part_date")
    byname = {a.name: a for a in ks.attributes}
    assert ks.id_attr == "clip_id"
    assert byname["clip_id"].unique
    assert byname["codec"].enum_domain is not None
    assert set(byname["codec"].enum_domain) >= {"pcm_s16le", "flac", "ulaw", "mp3"}
    assert byname["sr_hz"].min_value is not None
    # transcript has injected nulls → not required
    assert not byname["transcript"].required
    assert byname["dur_ms"].required
    st = to_struct_type(ks)
    assert st["clip_id"].dataType.typeName() == "string"
    assert st["bytes"].dataType.typeName() == "binary"


def test_infer_metamodel_refs(spark, audio_tables):
    mm = infer_metamodel(
        {"clips": audio_tables["clips"], "transcript_map": audio_tables["transcript_map"]}
    )
    tm = mm.kinds["transcript_map"]
    byname = {a.name: a for a in tm.attributes}
    assert byname["clip_id"].ref_to == "clips"
    assert tm.id_attr == "transcript_id"
    # ordering: referenced kind first
    order = kind_order(mm)
    assert order.index("clips") < order.index("transcript_map")


def test_metamodel_json_roundtrip(spark, audio_tables):
    mm = infer_metamodel({"clips": audio_tables["clips"]})
    mm2 = Metamodel.from_json(mm.to_json())
    assert mm2.kinds["clips"].id_attr == mm.kinds["clips"].id_attr
    assert [a.name for a in mm2.kinds["clips"].attributes] == [
        a.name for a in mm.kinds["clips"].attributes
    ]


def test_compiled_constraints_find_fixture_violations(spark, audio_tables, manifest, tmp_path):
    """Inference → compilation → execution: the auto-derived plan catches
    the injected uniqueness + referential violations with zero hand-written
    config."""
    from unify_spark.operators.base import ValidationContext
    from unify_spark.plans import ValidationRunner

    mm = infer_metamodel(
        {"clips": audio_tables["clips"], "transcript_map": audio_tables["transcript_map"]}
    )
    constraints = compile_constraints(mm)
    names = [c.name for c in constraints]
    assert "uniqueness:clips.clip_id" in names
    assert any(n.startswith("referential:transcript_map.clip_id->clips") for n in names)
    runner = ValidationRunner(
        spark, str(tmp_path), ValidationContext(run_id="inferred")
    )
    res = runner.run(audio_tables, constraints, resume=False)
    assert res.violation_counts["uniqueness:clips.clip_id"] == 2 * len(
        manifest["uniqueness_clip_ids"]
    )
    ri = [k for k in res.violation_counts if k.startswith("referential:transcript_map")][0]
    assert res.violation_counts[ri] == len(manifest["dangling_transcript_ids"])


def test_uid_helpers(spark):
    df = spark.createDataFrame([("ds1", "s1", "m1")], ["dataset", "sample", "m"])
    row = df.select(
        context_uid("dataset", "sample", "m").alias("uid"),
        hashed_uid("dataset", "sample", "m").alias("huid"),
        composite_id("sample", "m").alias("cid"),
    ).collect()[0]
    assert row["uid"] == "ds1|:~s1|:~m1"
    assert row["cid"] == "s1-m1"
    assert row["huid"].startswith("ds1|:~") and len(row["huid"]) == len("ds1|:~") + 32
