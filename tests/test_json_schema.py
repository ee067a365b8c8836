"""JSON-Schema emission (infer-json-schema analogue, json_schema.clj:1-60)."""

import json

from unify_spark.schema.json_schema import kind_json_schema, metamodel_json_schema
from unify_spark.schema.model import AttributeSpec, KindSchema, Metamodel


def _kind():
    return KindSchema(
        kind="clips",
        attributes=[
            AttributeSpec("clip_id", "string", required=True, unique=True),
            AttributeSpec("codec", "string", enum_domain=["pcm_s16le", "flac"]),
            AttributeSpec("dur_ms", "int", min_value=1, max_value=30000),
            AttributeSpec("bytes", "bytes"),
            AttributeSpec("tags", "string", cardinality="many"),
        ],
        id_attr="clip_id",
    )


def test_kind_json_schema():
    js = kind_json_schema(_kind())
    assert js["required"] == ["clip_id"]
    assert js["properties"]["codec"]["enum"] == ["pcm_s16le", "flac"]
    assert js["properties"]["dur_ms"] == {"type": "integer", "minimum": 1, "maximum": 30000}
    assert js["properties"]["tags"]["type"] == "array"
    assert js["properties"]["bytes"]["contentEncoding"] == "base64"
    assert js["additionalProperties"] is False  # closed-map (specs.clj:181-190)
    assert js["x-unify-id"] == {"attr": "clip_id", "scope": "global"}


def test_metamodel_roundtrips_to_json():
    mm = Metamodel(kinds={"clips": _kind()})
    parsed = json.loads(metamodel_json_schema(mm))
    assert set(parsed) == {"clips"}
    assert parsed["clips"]["title"] == "clips"


def test_inferred_schema_emits(spark, audio_tables):
    from unify_spark.schema.infer import infer_metamodel

    mm = infer_metamodel({"clips": audio_tables["clips"]})
    parsed = json.loads(metamodel_json_schema(mm))
    props = parsed["clips"]["properties"]
    assert props["clip_id"]["type"] == "string"
    assert "enum" in props["codec"]
