"""Validation runner: execute a constraint plan, derive per-partition
verdicts, persist violations + audit rows, support checkpoint/resume.

This is the Spark restatement of unify's three-phase lifecycle (SURVEY §3):
driver-side plan (parse-config analogue) → one DataFrame job per constraint
stage → violation/verdict/audit sinks. Stages are independent DataFrame jobs,
so a failed run resumes by skipping stages recorded 'done' in the audit table
(semantics of successful-uuid-set,
reference src/com/vendekagonlabs/unify/db/import_coordination.clj:60-84).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unify_spark.operators.base import Constraint, ValidationContext, empty_violations
from unify_spark.plans.audit import AuditLog


@dataclass
class RunResult:
    run_id: str
    verdicts: dict[tuple[str, str], bool] = field(default_factory=dict)  # (constraint, part) -> pass
    violation_counts: dict[str, int] = field(default_factory=dict)
    rows_checked: dict[str, int] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    wall_sec: float = 0.0

    @property
    def total_violations(self) -> int:
        return sum(self.violation_counts.values())

    @property
    def passed(self) -> bool:
        return self.total_violations == 0


class ValidationRunner:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        ctx: ValidationContext | None = None,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.ctx = ctx or ValidationContext()
        self.audit = AuditLog(spark, os.path.join(out_dir, "audit"))

    # -- helpers -------------------------------------------------------------

    def _partition_universe(self, tables: dict[str, DataFrame], table: str) -> list[str]:
        df = tables.get(table)
        if df is None or self.ctx.part_col not in df.columns:
            return []
        return [
            r[0]
            for r in df.select(self.ctx.part_col).distinct().orderBy(self.ctx.part_col).collect()
        ]

    # -- main ----------------------------------------------------------------

    def run(
        self,
        tables: dict[str, DataFrame],
        constraints: list[Constraint],
        resume: bool = True,
    ) -> RunResult:
        t_run = time.time()
        res = RunResult(run_id=self.ctx.run_id)
        done = self.audit.completed_constraints(self.ctx.run_id) if resume else set()
        universes: dict[str, list[str]] = {}
        table_rows: dict[str, int] = {}

        for c in constraints:
            if c.name in done:
                res.skipped.append(c.name)
                continue
            t0 = time.time()
            vio = c.violations(tables, self.ctx)

            # cache the violation rows so the count aggregation and the
            # capped write share ONE computation of the (possibly expensive)
            # constraint plan
            vio = vio.persist()
            per_part = (
                vio.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()
            )
            counts = {r["part"]: r["n"] for r in per_part}
            total = sum(counts.values())
            res.violation_counts[c.name] = total

            if c.table not in table_rows:
                table_rows[c.table] = tables[c.table].count() if c.table in tables else 0
            res.rows_checked[c.name] = table_rows[c.table]

            if total:
                capped = vio.limit(self.ctx.violation_cap)
                capped.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(self.out_dir, "violations", _safe(c.name))
                )
            vio.unpersist()

            if c.table not in universes:
                universes[c.table] = self._partition_universe(tables, c.table)
            parts = universes[c.table] or [None]

            audit_rows = []
            wall = time.time() - t0
            for p in parts:
                n = counts.get(p, 0)
                # partition-less violations (e.g. dup spanning parts with no
                # part col) count against every partition? No — they carry
                # part=None and are reported at stage grain below.
                res.verdicts[(c.name, p)] = n == 0
                audit_rows.append(
                    {
                        "run_id": self.ctx.run_id,
                        "constraint": c.name,
                        "part": p,
                        "status": "pass" if n == 0 else "fail",
                        "violation_count": n,
                    }
                )
            audit_rows.append(
                {
                    "run_id": self.ctx.run_id,
                    "constraint": c.name,
                    "part": None,
                    "status": "done",
                    "violation_count": total,
                    "rows_checked": res.rows_checked[c.name],
                    "wall_sec": wall,
                }
            )
            self.audit.append(audit_rows)

            if self.ctx.fail_fast and total:
                # reference semantics: first anomaly kills the job
                # (src/com/vendekagonlabs/unify/import/engine.clj:166-181)
                break

        res.wall_sec = time.time() - t_run
        return res

    def verdict_matrix(self) -> DataFrame:
        return self.audit.verdicts(self.ctx.run_id)


def _safe(name: str) -> str:
    return "".join(ch if ch.isalnum() or ch in "._-" else "_" for ch in name)
