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
  rewrite; snapshot read = audit-table run_id filtering, the jar-free
  time-travel analogue).

With `--packages org.apache.iceberg:iceberg-spark-runtime-...` and a
catalog conf, the catalog path activates without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


# keyed by (applicationId, context startTime) — NOT id(spark): a
# garbage-collected session's id can be reused by a new session, which
# would inherit a stale probe result. Bounded: old sessions' entries are
# evicted once the cache outgrows any realistic session count.
_CATALOG_CACHE: dict[tuple[str, int], list[str]] = {}
_CATALOG_CACHE_MAX = 16


def _session_key(spark: SparkSession) -> tuple[str, int] | None:
    try:
        sc = spark.sparkContext
        return (sc.applicationId, sc.startTime)
    except Exception:  # pragma: no cover - stopped session mid-probe
        return None


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
        cache_key = _session_key(spark)
        if cache_key is not None and not refresh and cache_key in _CATALOG_CACHE:
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
        while len(_CATALOG_CACHE) >= _CATALOG_CACHE_MAX:
            _CATALOG_CACHE.pop(next(iter(_CATALOG_CACHE)))
        _CATALOG_CACHE[cache_key] = result
    return result


def iceberg_enabled(spark: SparkSession, catalog: str | None = None) -> bool:
    """True when an Iceberg catalog is configured (optionally a specific
    one). Conf-level detection only — cheap enough to gate every sink."""
    cats = iceberg_catalogs(spark)
    return (catalog in cats) if catalog else bool(cats)


def is_table_identifier(path_or_name: str, catalogs: list[str] | None = None) -> bool:
    """The storage dispatch rule: a catalog table identifier is dotted
    (``catalog.db.table``) with no path separators or file suffixes. The
    dot is REQUIRED — a bare relative directory name like ``audit_out``
    must keep routing to the filesystem even when a catalog happens to be
    configured (misrouting it to ``writeTo`` would fail every local
    workflow that worked before the catalog appeared).

    With ``catalogs`` supplied (the execution route always supplies it —
    ``routes_to_catalog``), the first dotted component must be a CONFIGURED
    catalog name: a whitelist, so a relative filesystem target like
    ``audit.json`` or ``out.db`` can never silently route to ``writeTo``
    just because some catalog exists and the suffix isn't on a blacklist.

    One deliberate exception: when ``spark_catalog`` itself is configured
    as an Iceberg ``SparkSessionCatalog`` (the standard way to make the
    SESSION catalog Iceberg-aware), a TWO-part identifier ``db.table``
    resolves through it — so it routes to the catalog too, as it did for
    every Spark SQL statement before this dispatch existed. File-shaped
    one-dot names keep filesystem routing via the suffix guard; a
    relative data file with an exotic suffix under a session catalog
    must be written as an explicit path (``./out.db``) — the ``/`` forces
    filesystem routing."""
    if (
        "/" in path_or_name
        or "." not in path_or_name
        or path_or_name.endswith(
            (".parquet", ".csv", ".tsv", ".json", ".jsonl", ".txt", ".orc", ".avro")
        )
    ):
        return False
    if catalogs is not None:
        if path_or_name.split(".", 1)[0] in catalogs:
            return True
        # db.table under an Iceberg-aware session catalog
        return "spark_catalog" in catalogs and path_or_name.count(".") == 1
    return True


def routes_to_catalog(spark: SparkSession, target: str) -> bool:
    """True when ``target`` should execute against an Iceberg catalog:
    shaped like an identifier AND its first component names a catalog
    configured on this session."""
    return is_table_identifier(target, catalogs=iceberg_catalogs(spark))


def _q(ident: str) -> str:
    """Backtick-quote one identifier component (column, view, table part)
    — user-supplied column/table names must never parse as SQL."""
    return "`" + ident.replace("`", "``") + "`"


def _q_table(table: str) -> str:
    return ".".join(_q(p) for p in table.split("."))


def merge_sql(table: str, keys: list[str], columns: list[str], source: str = "_src") -> str:
    """The MERGE INTO statement for an idempotent keyed upsert (the
    ``upsert_dim`` / audit-append contract). Pure string construction so
    the statement shape is unit-testable without Iceberg jars. Every
    identifier is backtick-quoted."""
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in keys)
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in columns if c not in keys)
    cols = ", ".join(_q(c) for c in columns)
    vals = ", ".join(f"s.{_q(c)}" for c in columns)
    # all-key tables have nothing to UPDATE — an empty SET clause is a
    # parse error, so degrade to insert-if-absent
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
    return (
        f"MERGE INTO {_q_table(table)} t USING {_q(source)} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def delete_run_sql(table: str, run_id: str) -> str:
    """The retraction statement (sinks.retract_run's catalog form)."""
    safe = run_id.replace("'", "''")
    return f"DELETE FROM {_q_table(table)} WHERE run_id = '{safe}'"


def append_rows(spark: SparkSession, df: DataFrame, target: str) -> None:
    """Append ``df`` to ``target``: Iceberg table append when ``target`` is
    a catalog identifier and a catalog is configured, else parquet-dir
    append (the shim used throughout this sandbox)."""
    if routes_to_catalog(spark, target):
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
    if routes_to_catalog(spark, target):
        import uuid

        # uuid-suffixed source view, dropped after the merge: a fixed
        # '_src' would clobber any user view of that name and leak
        view = f"_unify_merge_src_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(view)
        try:
            spark.sql(merge_sql(target, keys, df.columns, source=view))
        finally:
            spark.catalog.dropTempView(view)
    else:
        from unify_spark.sources.sinks import upsert_dim

        upsert_dim(spark, df, target, keys)


def retract_run_rows(spark: SparkSession, target: str, run_id: str) -> int:
    """Delete a run's rows: `DELETE WHERE` on the catalog path, else the
    filesystem predicate-rewrite shim (`sinks.retract_run`)."""
    if routes_to_catalog(spark, target):
        spark.sql(delete_run_sql(target, run_id))
        return -1  # Iceberg DELETE doesn't report a count without a snapshot diff
    from unify_spark.sources.sinks import retract_run

    return retract_run(spark, target, run_id)


def read_snapshot(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    as_of: str | None = None,
    as_of_run: str | None = None,
    audit_path: str | None = None,
) -> DataFrame:
    """Time-travel read. Catalog path: real Iceberg `VERSION AS OF` /
    `TIMESTAMP AS OF`. Parquet shim: ``as_of_run`` + ``audit_path`` give
    the jar-free analogue — the audit table records every run's rows with
    a commit timestamp, so "the table as of run A" is the rows of runs
    whose LAST audit commit is at or before run A's last commit, filtered
    by the table's own ``run_id`` column. Runs still in flight when A
    finished (later audit rows) are excluded, matching snapshot-isolation
    reads. Version/timestamp reads on the shim stay a clear error (a
    parquet directory keeps no snapshot log)."""
    if routes_to_catalog(spark, table):
        if version is not None:
            return spark.read.option("versionAsOf", version).table(table)
        if as_of is not None:
            return spark.read.option("timestampAsOf", as_of).table(table)
        return spark.table(table)
    if as_of_run is None or audit_path is None:
        raise ValueError(
            f"snapshot read needs an Iceberg catalog table, got {table!r} "
            "(parquet directories keep no snapshot history; pass as_of_run= "
            "and audit_path= for the audit-filtered run-grain analogue)"
        )
    from pyspark.sql import functions as F

    from unify_spark.plans.audit import AuditLog

    last_ts: dict[str, float] = {}
    for rid, ts in AuditLog(spark, audit_path)._read_columns(["run_id", "ts"]):
        if rid is not None and ts is not None:
            last_ts[rid] = max(last_ts.get(rid, float("-inf")), ts)
    if as_of_run not in last_ts:
        raise ValueError(
            f"run {as_of_run!r} not found in audit table {audit_path!r}"
        )
    cutoff = last_ts[as_of_run]
    committed = [rid for rid, ts in last_ts.items() if ts <= cutoff]
    return spark.read.parquet(table).where(F.col("run_id").isin(committed))
