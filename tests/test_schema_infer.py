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


def test_metamodel_diff_changes_and_severities():
    """Schema-evolution diff: every change class detected with the
    documented breaking/compatible convention (breaking = data valid under
    OLD can be invalid or misread under NEW)."""
    from unify_spark.schema.diff import diff_metamodels, diff_report
    from unify_spark.schema.model import AttributeSpec, KindSchema, Metamodel

    old = Metamodel(kinds={
        "clips": KindSchema(kind="clips", id_attr="clip_id", attributes=[
            AttributeSpec("clip_id", "string", required=True, unique=True),
            AttributeSpec("codec", "string", enum_domain=["wav", "flac"]),
            AttributeSpec("dur_ms", "int"),
            AttributeSpec("note", "string"),
            AttributeSpec("tags", "string", cardinality="many"),
            AttributeSpec("loose", "string", required=True),
        ]),
        "gone": KindSchema(kind="gone", attributes=[AttributeSpec("x", "int")]),
    })
    new = Metamodel(kinds={
        "clips": KindSchema(kind="clips", id_attr="clip_id", attributes=[
            AttributeSpec("clip_id", "string", required=True, unique=True),
            AttributeSpec("codec", "string", enum_domain=["wav"]),          # narrowed
            AttributeSpec("dur_ms", "long"),                                # type change
            AttributeSpec("tags", "string", cardinality="one"),             # card change
            AttributeSpec("loose", "string", required=False),               # loosened
            AttributeSpec("lang", "string"),                                # added optional
            AttributeSpec("sr_hz", "int", required=True),                   # added required
        ]),
        "fresh": KindSchema(kind="fresh", attributes=[AttributeSpec("y", "int")]),
    })
    changes = diff_metamodels(old, new)
    by = {(c.kind, c.attr, c.change): c.severity for c in changes}
    assert by[("gone", None, "kind_removed")] == "breaking"
    assert by[("fresh", None, "kind_added")] == "compatible"
    assert by[("clips", "note", "attr_removed")] == "breaking"
    assert by[("clips", "lang", "attr_added")] == "compatible"
    assert by[("clips", "sr_hz", "attr_added_required")] == "breaking"
    assert by[("clips", "dur_ms", "type_changed")] == "breaking"
    assert by[("clips", "tags", "cardinality_changed")] == "breaking"
    assert by[("clips", "loose", "required_loosened")] == "compatible"
    assert by[("clips", "codec", "enum_narrowed")] == "breaking"
    assert len(changes) == 9

    rep = diff_report(changes)
    assert rep["n_changes"] == 9 and rep["n_breaking"] == 6
    # breaking changes sort first for the audit/CI reader
    sevs = [c["severity"] for c in rep["changes"]]
    assert sevs == sorted(sevs, key=lambda s: s != "breaking")

    # identical metamodels: empty diff
    assert diff_metamodels(new, new) == []


def test_cli_schema_diff_gate(tmp_path, capsys):
    """CI gate shape: schema-diff prints the report and --fail-on-breaking
    exits non-zero exactly when a breaking change exists."""
    import json as _json

    from unify_spark import cli
    from unify_spark.schema.model import AttributeSpec, KindSchema, Metamodel

    old = Metamodel(kinds={"t": KindSchema(kind="t", attributes=[
        AttributeSpec("a", "string"), AttributeSpec("b", "int")])})
    new = Metamodel(kinds={"t": KindSchema(kind="t", attributes=[
        AttributeSpec("a", "string")])})  # b removed -> breaking
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(old.to_json()); pn.write_text(new.to_json())

    rc = cli.main(["schema-diff", "--old", str(po), "--new", str(pn)])
    rep = _json.loads(capsys.readouterr().out)
    assert rc == 0 and rep["n_breaking"] == 1
    assert rep["changes"][0]["change"] == "attr_removed"

    rc2 = cli.main(["schema-diff", "--old", str(po), "--new", str(pn), "--fail-on-breaking"])
    capsys.readouterr()
    assert rc2 == 1

    rc3 = cli.main(["schema-diff", "--old", str(po), "--new", str(po), "--fail-on-breaking"])
    rep3 = _json.loads(capsys.readouterr().out)
    assert rc3 == 0 and rep3["n_changes"] == 0


def test_cli_infer_schema_baseline_drift(spark, tmp_path, capsys):
    """infer-schema --baseline prints the schema-drift report against a
    stored metamodel — one command for the inference + evolution gate."""
    import json as _json

    from unify_spark import cli

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id int, name string, v double"
    ).write.parquet(src)

    mm_path = str(tmp_path / "mm.json")
    rc = cli.main(["infer-schema", "--tables", f"t={src}", "--out", mm_path])
    capsys.readouterr()
    assert rc == 0

    # evolve the table: drop a column, add one
    src2 = str(tmp_path / "t2")
    spark.createDataFrame(
        [(1, 1.0, "x"), (2, 2.0, "y")], "id int, v double, extra string"
    ).write.parquet(src2)
    rc2 = cli.main(["infer-schema", "--tables", f"t={src2}", "--out",
                    str(tmp_path / "mm2.json"), "--baseline", mm_path])
    rep = _json.loads(capsys.readouterr().out)
    assert rc2 == 0
    got = {(c["change"], c["attr"]) for c in rep["changes"]}
    assert ("attr_removed", "name") in got
    assert any(ch.startswith("attr_added") and a == "extra" for ch, a in got)
    assert rep["n_breaking"] >= 1

    # without --out, stdout must carry exactly ONE JSON document (the
    # drift report with the inferred metamodel embedded), not two
    # concatenated ones
    rc3 = cli.main(["infer-schema", "--tables", f"t={src2}", "--baseline", mm_path])
    out3 = capsys.readouterr().out
    rep3 = _json.loads(out3)  # would raise on concatenated documents
    assert rc3 == 0 and "metamodel" in rep3 and rep3["n_breaking"] >= 1


def test_metamodel_diff_unique_bounds_and_kind_fields():
    """The gate must catch uniqueness tightenings, numeric-bound
    narrowings, and kind-level field changes — data valid under the old
    schema becomes invalid under the new one in each case."""
    from unify_spark.schema.diff import diff_metamodels
    from unify_spark.schema.model import AttributeSpec, KindSchema, Metamodel

    old = Metamodel(kinds={"t": KindSchema(kind="t", parent=None, attributes=[
        AttributeSpec("a", "int", unique=False),
        AttributeSpec("b", "double", min_value=None, max_value=100.0),
        AttributeSpec("c", "double", min_value=0.0, max_value=None),
    ])})
    new = Metamodel(kinds={"t": KindSchema(kind="t", parent="root", attributes=[
        AttributeSpec("a", "int", unique=True),                       # tightened
        AttributeSpec("b", "double", min_value=0.0, max_value=100.0), # lower bound appears
        AttributeSpec("c", "double", min_value=None, max_value=None), # bound removed
    ])})
    by = {(c.attr, c.change): c.severity for c in diff_metamodels(old, new)}
    assert by[("a", "unique_tightened")] == "breaking"
    assert by[("b", "range_narrowed")] == "breaking"
    assert by[("c", "range_widened")] == "compatible"
    assert by[(None, "parent_changed")] == "breaking"
    # reverse direction: loosening is compatible
    by2 = {(c.attr, c.change): c.severity for c in diff_metamodels(new, old)}
    assert by2[("a", "unique_loosened")] == "compatible"
    assert by2[("b", "range_widened")] == "compatible"
    assert by2[("c", "range_narrowed")] == "breaking"
