"""JSON-Schema emission from a Metamodel — the `infer-json-schema` analogue
(reference src/com/vendekagonlabs/unify/db/schema/compile/json_schema.clj:1-60):
the reference emits JSON Schema so import configs can be validated by
standard tooling; we emit one JSON Schema per kind describing its rows, so
external producers can validate records before they ever reach the engine.

Driver-side pure Python (schema work is metadata, never a Spark job).
"""

from __future__ import annotations

import json
from typing import Any

from unify_spark.schema.model import AttributeSpec, KindSchema, Metamodel

_JSON_TYPE = {
    "string": "string",
    "long": "integer",
    "int": "integer",
    "double": "number",
    "float": "number",
    "decimal": "number",
    "boolean": "boolean",
    "instant": "string",  # ISO-8601
    "keyword": "string",
    "uuid": "string",
    "uri": "string",
    "symbol": "string",
    "bytes": "string",  # base64 in JSON transport
}


def _attr_schema(a: AttributeSpec) -> dict[str, Any]:
    base: dict[str, Any] = {"type": _JSON_TYPE.get(a.dtype, "string")}
    if a.dtype == "instant":
        base["format"] = "date-time"
    if a.dtype == "bytes":
        base["contentEncoding"] = "base64"
    if a.enum_domain:
        base["enum"] = list(a.enum_domain)
    if a.min_value is not None:
        base["minimum"] = a.min_value
    if a.max_value is not None:
        base["maximum"] = a.max_value
    if a.doc:
        base["description"] = a.doc
    if a.cardinality == "many":
        return {"type": "array", "items": base}
    return base


def kind_json_schema(kind: KindSchema) -> dict[str, Any]:
    required = [a.name for a in kind.attributes if a.required]
    out: dict[str, Any] = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": kind.kind,
        "type": "object",
        "properties": {a.name: _attr_schema(a) for a in kind.attributes},
        "additionalProperties": False,  # closed-map semantics (specs.clj:181-190)
    }
    if required:
        out["required"] = required
    if kind.id_attr:
        out["x-unify-id"] = {"attr": kind.id_attr, "scope": kind.id_scope}
    if kind.parent:
        out["x-unify-parent"] = kind.parent
    return out


def metamodel_json_schema(mm: Metamodel) -> str:
    return json.dumps(
        {k: kind_json_schema(v) for k, v in sorted(mm.kinds.items())},
        indent=2,
        sort_keys=True,
    )
