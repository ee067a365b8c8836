"""Source readers with lineage annotation + input contracts.

Reference parity:
- TSV/CSV streaming scan with line numbers and whitespace trim
  (src/com/vendekagonlabs/unify/import/engine.clj:60-75) → ``spark.read.csv``
  + ``_source_file``/``_row_index`` lineage columns.
- header/columns contract check (engine.clj:77-115) → driver-side set diff
  on ``df.columns`` before any job runs.
- NA normalization (data.clj:600-619) → token set → null, columnar.
- glob file matching (util/io.clj:76-103) → glob paths in the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


class MissingColumnsError(ValueError):
    pass


def check_required_columns(df: DataFrame, required: list[str], source: str = "") -> None:
    """Throw before launching any job if the config names absent columns
    (exact semantics of the reference's header contract check)."""
    missing = sorted(set(required) - set(df.columns))
    if missing:
        raise MissingColumnsError(
            f"columns {missing} required but not present in {source or 'input'};"
            f" available: {sorted(df.columns)}"
        )


def read_csv_with_lineage(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    header: bool = True,
    schema=None,
    trim: bool = True,
) -> DataFrame:
    """CSV/TSV scan (glob ok) with per-row lineage: source file + row index
    within the scan. Lineage mirrors unify's file/line annotations
    (data.clj:642-643); ``_row_index`` is a scan-ordinal (monotonic id), not
    a byte offset — stable within one job, which is all the violation report
    needs."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if trim:
        for name, dtype in df.dtypes:
            if dtype == "string":
                df = df.withColumn(name, F.trim(F.col(name)))
    return df.withColumns(
        {
            "_source_file": F.input_file_name(),
            "_row_index": F.monotonically_increasing_id(),
        }
    )


def read_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    """Parquet directory, Iceberg table name, or csv — one entry point."""
    if path_or_name.endswith(".csv") or path_or_name.endswith(".tsv"):
        sep = "\t" if path_or_name.endswith(".tsv") else ","
        return read_csv_with_lineage(spark, path_or_name, sep=sep)
    import os

    # an existing local path wins over a catalog lookup: a relative dir
    # like "out.db" or "audit.json" must not route to spark.table just
    # because it is dotted (the write side's whitelist rule, mirrored)
    if (
        "/" in path_or_name
        or path_or_name.endswith(".parquet")
        or os.path.exists(path_or_name)
    ):
        return spark.read.parquet(path_or_name)
    return spark.table(path_or_name)


def normalize_na(
    df: DataFrame, na_tokens: list[str] = ("", "NA", "N/A", "null", "NULL"), columns=None
) -> DataFrame:
    """Configurable NA token set → null (unify's handle-na semantics:
    the token list applies per-attr or to all attrs)."""
    cols = columns or [n for n, t in df.dtypes if t == "string"]
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(F.col(c).isin(list(na_tokens)), None).otherwise(F.col(c))
        )
    return out


def apply_na_omit_policy(
    df: DataFrame,
    omit_if_na: list[str],
    na_tokens: list[str] = ("", "NA", "N/A", "null", "NULL"),
) -> DataFrame:
    """Row-omit half of unify's handle-na (data.clj:600-619): after NA
    normalization, a row is OMITTED entirely when

    - ``omit_if_na == ["*"]`` and ANY column is NA/null, or
    - any of the LISTED columns is NA/null.

    Returns the surviving rows with NA tokens normalized to null. One scan,
    one fused filter — the omit predicate folds into the parquet scan."""
    out = normalize_na(df, na_tokens)
    targets = out.columns if omit_if_na == ["*"] else list(omit_if_na)
    keep = F.lit(True)
    for c in targets:
        keep = keep & F.col(c).isNotNull()
    return out.where(keep)
