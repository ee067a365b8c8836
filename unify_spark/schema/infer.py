"""Schema + metamodel inference from data (the `infer-schema` /
`infer-metaschema` direction, reference
src/com/vendekagonlabs/unify/db/schema/compile.clj:298-316 and
compile/metaschema.clj:34-62).

Spark already infers physical types on read; what unify adds — and we
replicate — is inferring the *metamodel*: which column is the id (unique,
non-null), which columns are enums (low distinct count), which are refs
(name/value overlap with another kind's id), required-ness (zero observed
nulls), and numeric ranges. One aggregation pass per table computes all the
profile statistics (HLL distinct counts, null counts, min/max) — no
per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from unify_spark.schema.model import AttributeSpec, KindSchema, Metamodel

_SPARK_TO_DSL = {
    "string": "string",
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "timestamp": "instant",
    "timestamp_ntz": "instant",
    "date": "instant",
    "binary": "bytes",
}


def infer_kind_schema(
    df: DataFrame,
    kind: str,
    enum_max_distinct: int = 32,
    enum_max_ratio: float = 0.01,
    # tolerance absorbs both HLL error (~1%) and real-world dirty data: an
    # id column with a handful of duplicates should still be PROPOSED as the
    # id — the compiled UniquenessConstraint is what then reports the dups
    id_distinct_tolerance: float = 0.97,
    partition_attr: str | None = None,
    exclude_from_constraints: tuple[str, ...] = ("part_date", "_source_file", "source_file"),
) -> KindSchema:
    """Profile one table and propose its KindSchema.

    ``exclude_from_constraints`` names partition/lineage columns whose low
    cardinality is structural, not semantic — they are profiled but never
    proposed as enum domains (a partition-date domain constraint would be
    noise, not a contract)."""
    exprs = [F.count(F.lit(1)).alias("__n")]
    for name, dtype in df.dtypes:
        base = dtype.split("(")[0]
        exprs.append(F.sum(F.col(name).isNull().cast("long")).alias(f"{name}||nulls"))
        if base != "binary":
            exprs.append(F.approx_count_distinct(name, 0.01).alias(f"{name}||dist"))
        if base in ("bigint", "int", "smallint", "tinyint", "double", "float"):
            exprs.append(F.min(name).cast("double").alias(f"{name}||min"))
            exprs.append(F.max(name).cast("double").alias(f"{name}||max"))
    row = df.agg(*exprs).collect()[0].asDict()
    n = row["__n"]

    attrs: list[AttributeSpec] = []
    id_candidates: list[tuple[str, float]] = []
    for name, dtype in df.dtypes:
        base = dtype.split("(")[0]
        dsl = _SPARK_TO_DSL.get(base, "string")
        if base.startswith("array"):
            dsl, card = _SPARK_TO_DSL.get(dtype[6:-1], "string"), "many"
        else:
            card = "one"
        nulls = row.get(f"{name}||nulls", 0) or 0
        dist = row.get(f"{name}||dist")
        a = AttributeSpec(
            name=name,
            dtype=dsl,
            cardinality=card,
            required=(nulls == 0 and n > 0),
            min_value=row.get(f"{name}||min"),
            max_value=row.get(f"{name}||max"),
        )
        if dist is not None and n > 0:
            ratio = dist / n
            # approx_count_distinct undercounts slightly; >= tolerance → id
            if ratio >= id_distinct_tolerance and nulls == 0:
                a.unique = True
                if base == "string" or name.endswith("_id") or name.endswith("key"):
                    id_candidates.append((name, ratio))
            elif base == "string" and (
                dist <= enum_max_distinct
                and ratio <= enum_max_ratio
                and name != partition_attr
                and name not in exclude_from_constraints
            ):
                # low-cardinality string → enum; capture the domain exactly
                domain = [
                    r[0]
                    for r in df.select(name).where(F.col(name).isNotNull()).distinct().collect()
                ]
                if len(domain) <= enum_max_distinct:
                    a.enum_domain = sorted(domain)
        attrs.append(a)

    id_attr = id_candidates[0][0] if id_candidates else None
    return KindSchema(
        kind=kind,
        attributes=attrs,
        id_attr=id_attr,
        id_scope="global",
        partition_attr=partition_attr,
    )


def infer_metamodel(tables: dict[str, DataFrame], **kwargs) -> Metamodel:
    """Infer all kinds, then propose refs: a column in kind A whose name
    matches kind B's id attribute (metaschema join inference,
    compile/metaschema.clj:44-56 'joins from ref attrs')."""
    mm = Metamodel(
        kinds={k: infer_kind_schema(df, k, **kwargs) for k, df in tables.items()}
    )
    ids = {ks.id_attr: kind for kind, ks in mm.kinds.items() if ks.id_attr}
    for kind, ks in mm.kinds.items():
        for a in ks.attributes:
            if a.name in ids and ids[a.name] != kind:
                a.ref_to = ids[a.name]
    return mm
