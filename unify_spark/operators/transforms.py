"""Prepare-engine per-row transforms (SURVEY §2.2), re-expressed as columnar
operations. In the reference these compose per record inside
``record->entity`` (src/com/vendekagonlabs/unify/import/engine/parse/data.clj:628-687);
here each is a DataFrame→DataFrame function built from Column expressions
(whole-stage codegen, no Python).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def select_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Row→entity projection: select config-named source columns under their
    target attribute names (data.clj:430-446)."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def cast_strict(df: DataFrame, types: dict[str, str], flag_col: str = "_cast_errors") -> DataFrame:
    """Type cast with error capture (data.clj:41-59,73-88): failed casts
    become nulls PLUS an array of '<col>:<raw>' markers, so bad rows are
    violation data rather than job-killing exceptions (SURVEY §7.4)."""
    exprs, markers = [], []
    for col in df.columns:
        if col in types:
            # try_cast: failed parses yield null instead of the ANSI throw;
            # marker references the ORIGINAL value, so build one select
            casted = F.col(col).try_cast(types[col])
            exprs.append(casted.alias(col))
            markers.append(
                F.when(
                    F.col(col).isNotNull() & casted.isNull(),
                    F.concat_ws(":", F.lit(col), F.col(col).cast("string")),
                )
            )
        else:
            exprs.append(F.col(col))
    return df.select(*exprs, F.array_compact(F.array(*markers)).alias(flag_col))


def card_many_split(df: DataFrame, column: str, delimiter: str) -> DataFrame:
    """Cardinality-many cell split (data.clj:556-574): delimiter is treated
    literally (regex-escaped), empty cells → empty array not [''], matching
    the reference's handling."""
    pat = re.escape(delimiter)
    split = F.split(F.col(column), pat)
    return df.withColumn(
        column,
        F.when(F.col(column).isNull() | (F.col(column) == ""), F.array().cast("array<string>"))
        .otherwise(split),
    )


def molten(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    variable_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Melt/unpivot (data.clj:537-553 `:unify/variable`+`:unify/value`):
    wide measurement columns → (variable, value) long rows via the built-in
    unpivot (the stack() physical form)."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        variable_name,
        value_name,
    )


def constants_injection(df: DataFrame, constants: dict) -> DataFrame:
    """Config-literal columns merged into every row (data.clj:577-585);
    Catalyst constant-folds these."""
    out = df
    for name, value in constants.items():
        out = out.withColumn(name, F.lit(value))
    return out


def tuple_assembly(df: DataFrame, target: str, components: list[str]) -> DataFrame:
    """N columns → one struct-typed tuple attribute (data.clj:448-487);
    arity is enforced by the schema, heterogeneity by struct field types."""
    return df.withColumn(target, F.struct(*[F.col(c) for c in components]))


def reverse_reference(
    child: DataFrame, parent_key_col: str, fk_name: str
) -> DataFrame:
    """`:unify/reverse` (data.clj:412-419): the child row asserts the ref to
    its parent — relationally that's just naming the FK column on the child."""
    return child.withColumn(fk_name, F.col(parent_key_col))


def melt_matrix_dense(
    df: DataFrame, index_cols: list[str], value_cols: list[str], value_name: str = "value"
) -> DataFrame:
    """Dense matrix file → long format (matrix_file.clj:33-117): one row per
    (index..., column) cell, NA cells dropped like the reference's NA skip."""
    long = molten(df, index_cols, value_cols, "col_key", value_name)
    return long.where(F.col(value_name).isNotNull())
