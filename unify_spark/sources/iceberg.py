"""Iceberg table adapter — the catalog-aware path for audit/violation
state, with the parquet-directory shim as the jar-free fallback.

The engine's storage contract (audit appends keyed (run_id, constraint,
part); violation partition overwrites; run retraction; snapshot reads) maps
onto Iceberg as: `writeTo(...).append()`, `MERGE INTO` on the key columns,
`DELETE WHERE run_id = ...`, and `VERSION AS OF` reads. This sandbox ships
no Iceberg runtime jars, so the adapter is split exactly at the jar
boundary:

- **dispatch + SQL generation** are real and unit-tested (a catalog is
  detected from `spark.sql.catalog.<name>` conf; the emitted MERGE/DELETE
  statements are asserted verbatim);
- **execution** routes through the catalog when one is configured and
  through the parquet shim otherwise — the shim implements the same
  contract on directories (append = parquet append; retract = predicate
  rewrite; snapshot read = unsupported → clear error).

With `--packages org.apache.iceberg:iceberg-spark-runtime-...` and a
catalog conf, the catalog path activates without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


_CATALOG_CACHE: dict[int, list[str]] = {}


def iceberg_catalogs(
    spark: SparkSession, confs: dict | None = None, refresh: bool = False
) -> list[str]:
    """Names of configured Iceberg catalogs (``spark.sql.catalog.<name>``
    pointing at an Iceberg SparkCatalog/SparkSessionCatalog class).
    ``confs`` overrides the session conf for unit-testing the detection
    rule without a catalog-configured session.

    The session probe (context conf + SET for runtime-set keys) costs
    ~100 ms, so the result is CACHED per session — catalogs configured
    after the first probe need ``refresh=True`` (or configuration before
    first storage use, the normal deployment order)."""
    out = []
    cache_key = None
    if confs is None:
        cache_key = id(spark)
        if not refresh and cache_key in _CATALOG_CACHE:
            return _CATALOG_CACHE[cache_key]
        try:
            confs = dict(spark.sparkContext.getConf().getAll())
            # runtime-set confs (spark.conf.set after session start) are NOT
            # in the context conf — merge the explicitly-set SQL confs too,
            # or a notebook-configured catalog would silently go undetected
            for r in spark.sql("SET").collect():
                confs.setdefault(r["key"], r["value"])
        except Exception:  # pragma: no cover - conf always reachable in practice
            confs = confs if isinstance(confs, dict) else {}
    for k, v in list(confs.items()):
        # catalog keys are spark.sql.catalog.<name> (3 dots); deeper keys
        # (…<name>.type etc) configure, not declare, a catalog
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and "iceberg" in str(v).lower():
            out.append(k.rsplit(".", 1)[1])
    result = sorted(set(out))
    if cache_key is not None:  # cache only the session-probe path
        _CATALOG_CACHE[cache_key] = result
    return result


def iceberg_enabled(spark: SparkSession, catalog: str | None = None) -> bool:
    """True when an Iceberg catalog is configured (optionally a specific
    one). Conf-level detection only — cheap enough to gate every sink."""
    cats = iceberg_catalogs(spark)
    return (catalog in cats) if catalog else bool(cats)


def is_table_identifier(path_or_name: str) -> bool:
    """The storage dispatch rule: a catalog table identifier is dotted
    (``catalog.db.table``) with no path separators or file suffixes. The
    dot is REQUIRED — a bare relative directory name like ``audit_out``
    must keep routing to the filesystem even when a catalog happens to be
    configured (misrouting it to ``writeTo`` would fail every local
    workflow that worked before the catalog appeared)."""
    return (
        "/" not in path_or_name
        and "." in path_or_name
        and not path_or_name.endswith((".parquet", ".csv", ".tsv"))
    )


def merge_sql(table: str, keys: list[str], columns: list[str], source: str = "_src") -> str:
    """The MERGE INTO statement for an idempotent keyed upsert (the
    ``upsert_dim`` / audit-append contract). Pure string construction so
    the statement shape is unit-testable without Iceberg jars."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in keys)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    # all-key tables have nothing to UPDATE — an empty SET clause is a
    # parse error, so degrade to insert-if-absent
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
    return (
        f"MERGE INTO {table} t USING {source} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def delete_run_sql(table: str, run_id: str) -> str:
    """The retraction statement (sinks.retract_run's catalog form)."""
    safe = run_id.replace("'", "''")
    return f"DELETE FROM {table} WHERE run_id = '{safe}'"


def append_rows(spark: SparkSession, df: DataFrame, target: str) -> None:
    """Append ``df`` to ``target``: Iceberg table append when ``target`` is
    a catalog identifier and a catalog is configured, else parquet-dir
    append (the shim used throughout this sandbox)."""
    if is_table_identifier(target) and iceberg_enabled(spark):
        # first-ever append must CREATE the table — append() alone throws
        # NoSuchTableException on a fresh catalog
        if spark.catalog.tableExists(target):
            df.writeTo(target).append()
        else:
            df.writeTo(target).create()
    else:
        df.write.mode("append").parquet(target)


def upsert_rows(
    spark: SparkSession, df: DataFrame, target: str, keys: list[str]
) -> None:
    """Keyed idempotent upsert: MERGE INTO on the catalog path, else the
    parquet read-union-dedup shim (`sinks.upsert_dim`)."""
    if is_table_identifier(target) and iceberg_enabled(spark):
        df.createOrReplaceTempView("_src")
        spark.sql(merge_sql(target, keys, df.columns))
    else:
        from unify_spark.sources.sinks import upsert_dim

        upsert_dim(spark, df, target, keys)


def retract_run_rows(spark: SparkSession, target: str, run_id: str) -> int:
    """Delete a run's rows: `DELETE WHERE` on the catalog path, else the
    filesystem predicate-rewrite shim (`sinks.retract_run`)."""
    if is_table_identifier(target) and iceberg_enabled(spark):
        spark.sql(delete_run_sql(target, run_id))
        return -1  # Iceberg DELETE doesn't report a count without a snapshot diff
    from unify_spark.sources.sinks import retract_run

    return retract_run(spark, target, run_id)


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None, as_of: str | None = None
) -> DataFrame:
    """Time-travel read (`VERSION AS OF` / `TIMESTAMP AS OF`) — the
    cross-run drift baseline's natural source on a catalog; a parquet-dir
    shim has no snapshot history, so that combination is a clear error
    rather than silently reading HEAD."""
    if not is_table_identifier(table) or not iceberg_enabled(spark):
        raise ValueError(
            f"snapshot read needs an Iceberg catalog table, got {table!r} "
            "(parquet directories keep no snapshot history)"
        )
    if version is not None:
        return spark.read.option("versionAsOf", version).table(table)
    if as_of is not None:
        return spark.read.option("timestampAsOf", as_of).table(table)
    return spark.table(table)
