"""Schema + metamodel data model (SURVEY §1): the declarative layer that the
constraint planner compiles.

Mirrors unify's three compiled artifacts — schema.edn (attributes),
metamodel.edn (kind tree, id scopes, refs), enums.edn (closed domains) —
(reference src/com/vendekagonlabs/unify/db/schema/compile.clj:184-212) as one
JSON-serializable dataclass family, with a compiler to Spark ``StructType``.

Identity model parity (reference SURVEY §1.4):
- global ids → ``id_scope='global'`` (unique across the table universe)
- context ids → ``id_scope='context'``; the engine synthesizes a UID as
  ``concat_ws('|:~', *ancestor ids)`` like unify's UID tuples
  (src/com/vendekagonlabs/unify/import/engine/parse/data.clj:130-188), with
  ``md5`` hashing available for length-bounded sinks (tx_data.clj:67-85).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

UID_SEP = "|:~"  # unify's UID path delimiter (data.clj:66)
COMPOSITE_SEP = "-"  # synthetic composite id join (metamodel.clj:94-111)

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "decimal": T.DecimalType(38, 18),
    "boolean": T.BooleanType(),
    "instant": T.TimestampType(),
    "keyword": T.StringType(),  # enums: string + domain constraint
    "uuid": T.StringType(),
    "uri": T.StringType(),
    "symbol": T.StringType(),
    "bytes": T.BinaryType(),
}


@dataclass
class AttributeSpec:
    name: str
    dtype: str  # key of _TYPE_MAP
    cardinality: str = "one"  # one | many  (many → ArrayType)
    required: bool = False
    unique: bool = False
    doc: str = ""
    enum_domain: list[str] | None = None
    ref_to: str | None = None  # kind name this attr references
    min_value: float | None = None
    max_value: float | None = None
    # heterogeneous tuple attribute (compile.clj ::tuple-of): member types in
    # order; compiles to a StructType with positional fields (_0, _1, ...)
    tuple_types: list[str] | None = None

    def spark_type(self) -> T.DataType:
        if self.tuple_types:
            base: T.DataType = T.StructType(
                [
                    T.StructField(f"_{i}", _TYPE_MAP[t], True)
                    for i, t in enumerate(self.tuple_types)
                ]
            )
        else:
            base = _TYPE_MAP[self.dtype]
        return T.ArrayType(base) if self.cardinality == "many" else base


@dataclass
class KindSchema:
    """One entity kind = one table (the metaschema projection the reference
    derives in src/com/vendekagonlabs/unify/db/schema/compile/metaschema.clj:34-62)."""

    kind: str
    attributes: list[AttributeSpec] = field(default_factory=list)
    parent: str | None = None
    id_attr: str | None = None
    id_scope: str = "global"  # global | context
    composite_id_components: list[str] | None = None
    partition_attr: str | None = None

    def attribute(self, name: str) -> AttributeSpec:
        for a in self.attributes:
            if a.name == name:
                return a
        raise KeyError(name)


@dataclass
class Metamodel:
    kinds: dict[str, KindSchema] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {k: asdict(v) for k, v in self.kinds.items()}, indent=2, sort_keys=True
        )

    @classmethod
    def from_json(cls, s: str) -> "Metamodel":
        raw = json.loads(s)
        kinds = {}
        for k, v in raw.items():
            attrs = [AttributeSpec(**a) for a in v.pop("attributes")]
            kinds[k] = KindSchema(attributes=attrs, **v)
        return cls(kinds=kinds)


def to_struct_type(kind: KindSchema) -> T.StructType:
    return T.StructType(
        [
            T.StructField(a.name, a.spark_type(), nullable=not a.required)
            for a in kind.attributes
        ]
    )


def context_uid(*id_cols: str | Column) -> Column:
    """Context-scoped UID: ancestors-first path join (data.clj:130-188)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in id_cols]
    return F.concat_ws(UID_SEP, *cols)


def hashed_uid(*id_cols: str | Column) -> Column:
    """UID with the path element md5-hashed, unify's 256-char workaround
    (tx_data.clj:67-85): (first, md5(rest-joined))."""
    cols = [F.col(c) if isinstance(c, str) else c for c in id_cols]
    return F.concat_ws(UID_SEP, cols[0], F.md5(F.concat_ws(UID_SEP, *cols[1:])))


def composite_id(*component_cols: str | Column) -> Column:
    """Synthetic composite id (data.clj:504-530)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in component_cols]
    return F.concat_ws(COMPOSITE_SEP, *[c.cast("string") for c in cols])


def family_tree(mm: "Metamodel", kind: str) -> list[str]:
    """Ancestor chain root→kind via parent links (metamodel/family-tree-ids,
    reference src/com/vendekagonlabs/unify/db/metamodel.clj)."""
    path, cur, seen = [], kind, set()
    while cur is not None:
        if cur in seen:
            raise ValueError(f"parent cycle at kind {cur!r}")
        seen.add(cur)
        path.append(cur)
        cur = mm.kinds[cur].parent if cur in mm.kinds else None
    return list(reversed(path))


@dataclass
class ContextNode:
    """One node of the parsed import-config context tree — the structure
    resolve-ref-uid-in-context walks (data.clj:228-250). ``id_value`` is the
    literal id the config pins at this node (a string) or a column name in
    the row being resolved."""

    kind: str
    id_value: str | Column | None = None
    children: list["ContextNode"] = field(default_factory=list)


def _find_kind(node: ContextNode, kind: str) -> list[ContextNode] | None:
    """DFS for the first node of ``kind`` in the subtree; returns the
    node path root→match (collection/all-nested-maps analogue)."""
    if node.kind == kind:
        return [node]
    for ch in node.children:
        sub = _find_kind(ch, kind)
        if sub is not None:
            return [node] + sub
    return None


def resolve_ref_uid(
    mm: "Metamodel",
    config_root: ContextNode,
    job_path: list[int],
    target_kind: str,
    value: str | Column,
) -> Column:
    """Ref→UID resolution with upward context-tree expansion — the Spark
    restatement of resolve-ref-uid-in-context (data.clj:228-289).

    Semantics (matching ref-uid's three arms, data.clj:254-271):
    - target kind has a GLOBAL id, or sits directly under the root
      (family tree < 2 levels): the raw value IS the UID;
    - otherwise: starting at the job's context node, expand the search
      upward one ancestor at a time until a subtree containing
      ``target_kind`` is found; the UID is that node path's ancestor id
      values joined by '|:~' with the raw value as the leaf. Exhausting the
      ancestor stack raises (the reference logs 'Consumed ref stack').

    The tree walk is driver-side over the (tiny) config — per the reference,
    which memoizes on the config path, not the row — and the result is one
    Column expression, so resolution stays a zero-shuffle projection."""
    vcol = F.lit(value) if isinstance(value, str) else value
    ks = mm.kinds.get(target_kind)
    if ks is not None and ks.id_scope == "global":
        return vcol
    # the reference tests (butlast family-tree) < 2: kinds parented directly
    # under the root need no context prefix (data.clj:259-266)
    if len(family_tree(mm, target_kind)) - 1 < 2:
        return vcol

    # materialize the job node path root→job
    nodes = [config_root]
    for i in job_path:
        nodes.append(nodes[-1].children[i])

    for depth in range(len(nodes) - 1, -1, -1):
        found = _find_kind(nodes[depth], target_kind)
        if found is None:
            continue
        # ancestors of the matched node: the already-walked prefix above the
        # search root, plus the path down to (but excluding) the match
        ancestry = nodes[:depth] + found[:-1]
        prefix = [
            (F.lit(n.id_value) if isinstance(n.id_value, str) else n.id_value)
            for n in ancestry
            if n.id_value is not None
        ]
        return context_uid(*prefix, vcol)
    raise ValueError(
        f"consumed ref stack without finding referent kind {target_kind!r} "
        "while generating UID"
    )
