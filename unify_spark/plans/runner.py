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

import math
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unify_spark.operators.base import Constraint, ValidationContext, empty_violations
from unify_spark.plans.audit import AuditLog
from unify_spark.plans.retry import with_retries


@dataclass
class RunResult:
    run_id: str
    verdicts: dict[tuple[str, str], bool] = field(default_factory=dict)  # (constraint, part) -> pass
    violation_counts: dict[str, int] = field(default_factory=dict)
    rows_checked: dict[str, int] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    errors: dict[str, str] = field(default_factory=dict)  # constraint -> message
    wall_sec: float = 0.0
    # severity interpretation of violation_counts (see Constraint.severity):
    # blocking = error-severity names whose count exceeds their tolerance,
    # tolerated = error-severity names with violations within tolerance,
    # warn_counts = warn-severity names with violations. Filled by the
    # runner after counting; with no severity/tolerance declared anywhere,
    # blocking == violation_counts' non-zero names (the legacy pass rule).
    blocking: dict[str, int] = field(default_factory=dict)
    tolerated: dict[str, int] = field(default_factory=dict)
    warn_counts: dict[str, int] = field(default_factory=dict)
    # stages skipped because a depends_on dependency blocked (or was itself
    # gated): {constraint name: [the dependency names that gated it]}
    gated: dict[str, list[str]] = field(default_factory=dict)
    _severity_applied: bool = False

    @property
    def total_violations(self) -> int:
        return sum(self.violation_counts.values())

    @property
    def passed(self) -> bool:
        if self.errors:
            return False
        if self._severity_applied:
            return not self.blocking
        return self.total_violations == 0


def _shuffle_partitions(spark: SparkSession, default: int = 200) -> int:
    """spark.sql.shuffle.partitions as an int, tolerating non-numeric
    values like 'auto' (AQE-managed deployments) — used only to size the
    fused cache layout and the cap salt, where any sane positive count
    works."""
    try:
        return max(1, int(spark.conf.get("spark.sql.shuffle.partitions", str(default))))
    except (TypeError, ValueError):
        return default


def _dep_levels(constraints: list[Constraint]) -> list[list[Constraint]]:
    """Topological levels over ``depends_on`` (Kahn). Level 0 has no deps,
    level k depends only on earlier levels. Unknown names and cycles are
    config errors, raised before any Spark job runs."""
    names = {c.name for c in constraints}
    deps = {
        c.name: set(getattr(c, "depends_on", None) or []) for c in constraints
    }
    unknown = sorted({d for ds in deps.values() for d in ds} - names)
    if unknown:
        raise ValueError(f"depends_on references unknown constraints: {unknown}")
    order = {c.name: i for i, c in enumerate(constraints)}
    by_name = {c.name: c for c in constraints}
    levels: list[list[Constraint]] = []
    placed: set[str] = set()
    remaining = dict(deps)
    while remaining:
        # suite order within a level: fail_fast's "first anomaly" must mean
        # first in the user's suite, not first alphabetically
        ready = sorted(
            (n for n, ds in remaining.items() if ds <= placed),
            key=order.__getitem__,
        )
        if not ready:
            raise ValueError(
                f"depends_on cycle among constraints: {sorted(remaining)}"
            )
        levels.append([by_name[n] for n in ready])
        placed.update(ready)
        for n in ready:
            del remaining[n]
    return levels


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

    def _table_stats(
        self, tables: dict[str, DataFrame], table: str
    ) -> tuple[int, list[str]]:
        """(row_count, sorted partition universe) in ONE job — the separate
        count + distinct pre-scans were two passes over each table per run;
        groupBy(part).count() answers both from the same scan (and from
        column stats alone when the table is hive/Iceberg-partitioned)."""
        df = tables.get(table)
        if df is None:
            return 0, []
        if self.ctx.part_col not in df.columns:
            return df.count(), []
        rows = df.groupBy(self.ctx.part_col).count().collect()
        n = sum(r["count"] for r in rows)
        return n, sorted(r[0] for r in rows)

    def _apply_severity(self, res: RunResult, constraints: list[Constraint]) -> None:
        """Classify each emitted constraint's total count under its declared
        severity/tolerance (Constraint.severity docstring). Resumed stages
        hydrated without a rows_checked figure fall back to the ABSOLUTE
        tolerance only (rate × 0) — conservative, never more permissive."""
        for c in constraints:
            for name in getattr(c, "emits", [c.name]):
                n = res.violation_counts.get(name, 0)
                if n == 0:
                    continue
                if getattr(c, "severity", "error") == "warn":
                    res.warn_counts[name] = n
                elif n > c.allowed_violations(res.rows_checked.get(name, 0)):
                    res.blocking[name] = n
                else:
                    res.tolerated[name] = n
        res._severity_applied = True

    @staticmethod
    def _stage_blocks(res: RunResult, c: Constraint) -> bool:
        """True when this (already-completed or hydrated) stage's outcome
        should gate its dependents: it errored, or an emitted count exceeds
        its tolerance under error severity. Mirrors _apply_severity's rule,
        evaluated mid-run over the counts accumulated so far."""
        if c.name in res.errors:
            return True
        if getattr(c, "severity", "error") == "warn":
            return False
        return any(
            res.violation_counts.get(n, 0)
            > c.allowed_violations(res.rows_checked.get(n, 0))
            for n in getattr(c, "emits", [c.name])
        )

    def _gating_deps(self, res: RunResult, c: Constraint, by_name: dict) -> list[str]:
        """The subset of c's dependencies that gate it right now — blocked
        outcomes plus dependencies that were themselves gated (never ran:
        their verdict is unknown, so the dependent cannot run either)."""
        return [
            d
            for d in (getattr(c, "depends_on", None) or [])
            if d in res.gated or self._stage_blocks(res, by_name[d])
        ]

    def _record_gated(self, res: RunResult, c: Constraint, bad_deps: list[str]) -> None:
        """Audit a gated stage. Deliberately NOT 'done': a resumed run
        retries the stage once the dependency is fixed."""
        res.gated[c.name] = bad_deps
        self.audit.append(
            [
                {
                    "run_id": self.ctx.run_id,
                    "constraint": c.name,
                    "part": None,
                    "status": "gated",
                    "violation_count": None,
                }
            ]
        )

    # -- main ----------------------------------------------------------------

    def run(
        self,
        tables: dict[str, DataFrame],
        constraints: list[Constraint],
        resume: bool = True,
        max_concurrency: int = 8,
    ) -> RunResult:
        """Execute the plan. Constraint stages are independent DataFrame
        jobs, so they run CONCURRENTLY on the Spark scheduler (bounded by
        ``max_concurrency``) — the Spark restatement of the reference's
        40-way validation pipeline
        (src/com/vendekagonlabs/unify/validation/post_import.clj:26-53).
        ``fail_fast=True`` forces sequential execution to preserve the
        reference's first-anomaly-kills-the-job semantics."""
        import threading
        from concurrent.futures import ThreadPoolExecutor

        t_run = time.time()
        res = RunResult(run_id=self.ctx.run_id)
        done = self.audit.completed_constraints(self.ctx.run_id) if resume else set()
        parts_done = self.audit.part_results(self.ctx.run_id) if resume else {}
        rows_done = self.audit.stage_rows_checked(self.ctx.run_id) if resume else {}
        universes: dict[str, list[str]] = {}
        table_rows: dict[str, int] = {}
        lock = threading.Lock()

        def hydrate(c: Constraint) -> None:
            """Fill verdicts/counts for audit-recorded work so a resumed run's
            report (and exit code) reflects prior results instead of silently
            dropping them. Caller holds no lock (runs before stage threads or
            inside the stage lock)."""
            for name in getattr(c, "emits", [c.name]):
                recorded = parts_done.get(name, {})
                res.violation_counts[name] = res.violation_counts.get(name, 0) + sum(
                    n for _, n in recorded.values()
                )
                # restore the rate-tolerance denominator from the stage's
                # 'done' marker: without it a dependency that PASSED via
                # max_violation_rate reads allowed_violations(0)=0 on
                # resume and permanently gates its dependents
                if c.name in rows_done:
                    res.rows_checked.setdefault(name, rows_done[c.name])
                for p, (s, _) in recorded.items():
                    res.verdicts[(name, p)] = s == "pass"

        todo = []
        for c in constraints:
            if c.name in done:
                res.skipped.append(c.name)
                hydrate(c)
            else:
                todo.append(c)

        # precompute shared per-table facts once (not per stage, not racy)
        for c in todo:
            if c.table in tables and c.table not in table_rows:
                table_rows[c.table], universes[c.table] = self._table_stats(
                    tables, c.table
                )

        def run_stage(c: Constraint) -> None:
            t0 = time.time()
            universe = universes.get(c.table) or []
            recorded = parts_done.get(c.name, {}) if resume else {}
            # partition-grain resume: a partition-local constraint recomputes
            # ONLY partitions missing from the audit (killed-mid-run recovery
            # and incremental validation of newly-arrived partitions)
            partial = bool(getattr(c, "partition_local", False) and recorded and universe)
            stage_tables = tables
            if partial:
                pending = [p for p in universe if p not in recorded]
                with lock:
                    hydrate(c)
                if not pending:
                    with lock:
                        res.skipped.append(c.name)
                    self.audit.append(
                        [
                            {
                                "run_id": self.ctx.run_id,
                                "constraint": c.name,
                                "part": None,
                                "status": "done",
                                "violation_count": sum(n for _, n in recorded.values()),
                                "rows_checked": table_rows.get(c.table, 0),
                                "wall_sec": 0.0,
                            }
                        ]
                    )
                    return
                stage_tables = {
                    **tables,
                    c.table: tables[c.table].filter(
                        F.col(self.ctx.part_col).isin(pending)
                    ),
                }
            else:
                pending = universe or [None]

            vio = c.violations(stage_tables, self.ctx)
            # cache so the count aggregation and the capped write share ONE
            # computation of the (possibly expensive) constraint plan
            vio = vio.persist()
            try:
                per_part = (
                    vio.groupBy("constraint", "part")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                )
                counts: dict[str, dict] = {}
                for r in per_part:
                    counts.setdefault(r["constraint"], {})[r["part"]] = r["n"]
                total = sum(sum(d.values()) for d in counts.values())

                emits = getattr(c, "emits", [c.name])
                part_rows = []
                with lock:
                    for name in emits:
                        name_counts = counts.get(name, {})
                        res.violation_counts[name] = res.violation_counts.get(
                            name, 0
                        ) + sum(name_counts.values())
                        res.rows_checked[name] = table_rows.get(c.table, 0)
                        # include part keys that emitted violations beyond
                        # the universe (table-level constraints emit
                        # part=NULL) — see run_fused's audit loop
                        for p in {*pending, *name_counts}:
                            n = name_counts.get(p, 0)
                            res.verdicts[(name, p)] = n == 0
                            part_rows.append(
                                {
                                    "run_id": self.ctx.run_id,
                                    "constraint": name,
                                    "part": p,
                                    "status": "pass" if n == 0 else "fail",
                                    "violation_count": n,
                                }
                            )
                if total:
                    # partial reruns append (prior parts' violation files stay);
                    # fresh stages overwrite. Retried with backoff: a transient
                    # sink failure must not abort the stage (retry.py taxonomy).
                    mode = "append" if partial else "overwrite"
                    with_retries(
                        lambda: vio.limit(self.ctx.violation_cap)
                        .coalesce(1)
                        .write.mode(mode)
                        .parquet(os.path.join(self.out_dir, "violations", _safe(c.name)))
                    )
                    if self.ctx.collect_violating_keys:
                        # uncapped key set (quarantine input); dynamic
                        # overwrite scoped to THIS stage's constraint names
                        with_retries(
                            lambda: vio.select("constraint", "table", "key", "part")
                            .distinct()
                            .write.mode("append" if partial else "overwrite")
                            .option("partitionOverwriteMode", "dynamic")
                            .partitionBy("constraint")
                            .parquet(os.path.join(self.out_dir, "violating_keys"))
                        )
                # phase 1: part-grain lineage rows land AFTER the violation
                # write — a kill between the two leaves violations without
                # lineage (rewritten by the resumed run) rather than 'fail'
                # lineage whose evidence rows were never persisted (which a
                # partition-grain resume would skip forever)
                self.audit.append(part_rows)
            finally:
                vio.unpersist()

            wall = time.time() - t0
            # phase 2: the stage 'done' marker — whole-stage resume key;
            # count covers every name the stage emits (payload also emits
            # the bytes-nullness constraint)
            stage_count = sum(
                res.violation_counts.get(n, 0) for n in getattr(c, "emits", [c.name])
            )
            self.audit.append(
                [
                    {
                        "run_id": self.ctx.run_id,
                        "constraint": c.name,
                        "part": None,
                        "status": "done",
                        "violation_count": stage_count,
                        "rows_checked": res.rows_checked.get(c.name, 0),
                        "wall_sec": wall,
                    }
                ]
            )

        def run_stage_trapped(c: Constraint) -> None:
            """Uncaught-exception trap (reference validation report +
            engine.clj's anomaly channel): a stage that throws is recorded as
            an 'error' audit row and the run report instead of killing the
            other stages (fail-at-end); fail_fast re-raises."""
            try:
                run_stage(c)
            except Exception as e:  # noqa: BLE001 — trap IS the contract
                with lock:
                    res.errors[c.name] = f"{type(e).__name__}: {e}"
                self.audit.append(
                    [
                        {
                            "run_id": self.ctx.run_id,
                            "constraint": c.name,
                            "part": None,
                            "status": "error",
                            "violation_count": None,
                        }
                    ]
                )
                if self.ctx.fail_fast:
                    raise

        # dependency-ordered execution: stages run in topological levels,
        # and a stage whose depends_on dependency blocked (or was gated) is
        # recorded 'gated' instead of paying its (possibly decode-heavy)
        # scan. Suites without depends_on collapse to a single level —
        # identical behavior to before.
        by_name = {c.name: c for c in constraints}
        todo_names = {c.name for c in todo}
        levels = _dep_levels(constraints)

        if self.ctx.fail_fast:
            stop = False
            for level in levels:
                for c in level:
                    if stop or c.name not in todo_names:
                        continue
                    bad_deps = self._gating_deps(res, c, by_name)
                    if bad_deps:
                        self._record_gated(res, c, bad_deps)
                        continue
                    run_stage_trapped(c)
                    if any(res.violation_counts.get(n) for n in getattr(c, "emits", [c.name])):
                        # reference semantics: first anomaly kills the job
                        # (src/com/vendekagonlabs/unify/import/engine.clj:166-181)
                        stop = True
        else:
            with ThreadPoolExecutor(max_workers=max(1, max_concurrency)) as ex:
                for level in levels:
                    runnable = []
                    for c in level:
                        if c.name not in todo_names:
                            continue
                        bad_deps = self._gating_deps(res, c, by_name)
                        if bad_deps:
                            self._record_gated(res, c, bad_deps)
                        else:
                            runnable.append(c)
                    if runnable:
                        list(ex.map(run_stage_trapped, runnable))

        res.wall_sec = time.time() - t_run
        self._apply_severity(res, constraints)
        return res

    def profile(
        self,
        tables: dict[str, DataFrame],
        exclude: dict | None = None,
        sketches: bool = True,
        metrics_repo: str | None = None,
    ) -> None:
        """Persist column statistics (null rate, min/max, HLL distinct,
        sketch quantiles; global + per-partition) next to the audit table —
        the north-rule "metrics persisted to the audit table" sidecar.
        With ``sketches=True`` the per-partition MERGEABLE HLL sketch state
        is also persisted (profile.hll_sketches), so later distinct-count
        questions over any partition subset — including partitions loaded by
        FUTURE runs — merge stored sketches instead of re-scanning data.
        ``metrics_repo``: additionally append the stat rows, tagged with this
        run's id, to a cross-run :class:`~unify_spark.plans.history.
        MetricsRepository` (parquet dir or Iceberg table) so trailing-window
        anomaly checks scan ONE table instead of one sidecar per run."""
        from unify_spark.operators.profile import hll_sketches, profile_table

        repo = None
        if metrics_repo is not None:
            from unify_spark.plans.history import MetricsRepository

            repo = MetricsRepository(self.spark, metrics_repo)
        exclude = exclude or {}
        for name, df in tables.items():
            part = self.ctx.part_col if self.ctx.part_col in df.columns else None
            excl = exclude.get(name, ["bytes"])
            stats = profile_table(df, name, part_col=part, exclude=excl)
            if repo is not None:
                stats = stats.persist()
                repo.append(stats, self.ctx.run_id)
            stats.coalesce(1).write.mode("append").parquet(
                os.path.join(self.out_dir, "profile")
            )
            if repo is not None:
                stats.unpersist()
            if sketches:
                cols = [
                    n
                    for n, t in df.dtypes
                    if n not in excl and n != part and t.split("(")[0] in ("string", "bigint", "int", "long", "double", "float")
                ]
                if cols:
                    hll_sketches(df, name, cols, part_col=part).coalesce(1).write.mode(
                        "append"
                    ).parquet(os.path.join(self.out_dir, "profile_sketches"))
                # t-digest quantile sketches for numeric columns (the
                # north-star dur_ms/sr_hz slot): same incremental sidecar
                # shape as the HLL rows — per-partition digests merge later
                from unify_spark.operators import tdigest as _td

                num_cols = [
                    n
                    for n, t in df.dtypes
                    if n not in excl and n != part and t.split("(")[0] in ("bigint", "int", "long", "double", "float")
                ]
                for col in num_cols:
                    _td.sketch_rows(df, col, name, part_col=part).coalesce(1).write.mode(
                        "append"
                    ).parquet(os.path.join(self.out_dir, "profile_tdigest"))

    def run_fused(
        self,
        tables: dict[str, DataFrame],
        constraints: list[Constraint],
        resume: bool = True,
        _single_wave: bool = False,
    ) -> RunResult:
        """Execute the whole plan as ONE Spark job: the violation DataFrames
        of every pending stage are unioned (they share VIOLATION_SCHEMA) and
        counted/written in a single pass. Catalyst evaluates the union's
        branches as independent subtrees of one job, so the cluster stays
        saturated with zero per-stage scheduling gaps — the fused analogue of
        the reference's 40-way validation pipeline
        (src/com/vendekagonlabs/unify/validation/post_import.clj:26-53).

        Trade-off vs ``run``: per-stage wall times and mid-run resumability
        collapse to one unit (all-or-nothing per run); use ``run`` when
        stage-grain checkpointing matters more than throughput.

        ``depends_on`` executes as successive fused WAVES: each dependency
        level fuses into one job, and the next wave drops (gates) stages
        whose dependencies blocked — the cheap schema wave still saturates
        the cluster while the decode-heavy wave only runs on clean input.
        """
        from pyspark.sql import Window

        # _single_wave: internal recursion from the wave loop below — the
        # subset's depends_on names live in EARLIER waves, already adjudicated
        # by the caller, so re-leveling (and its unknown-name check) must not
        # run on the subset.
        levels = [constraints] if _single_wave else _dep_levels(constraints)
        if len(levels) > 1:
            by_name = {c.name: c for c in constraints}
            total = RunResult(run_id=self.ctx.run_id)
            t0 = time.time()
            for level in levels:
                keep = []
                for c in level:
                    bad_deps = self._gating_deps(total, c, by_name)
                    if bad_deps:
                        self._record_gated(total, c, bad_deps)
                    else:
                        keep.append(c)
                if keep:
                    r = self.run_fused(tables, keep, resume=resume, _single_wave=True)
                    total.verdicts.update(r.verdicts)
                    for k, v in r.violation_counts.items():
                        total.violation_counts[k] = total.violation_counts.get(k, 0) + v
                    total.rows_checked.update(r.rows_checked)
                    total.skipped.extend(r.skipped)
                    total.errors.update(r.errors)
                    total.blocking.update(r.blocking)
                    total.tolerated.update(r.tolerated)
                    total.warn_counts.update(r.warn_counts)
                    total.gated.update(r.gated)
            total.wall_sec = time.time() - t0
            total._severity_applied = True
            return total

        t_run = time.time()
        # UNIFY_TIMING=1 prints a per-phase breakdown to stderr — the tool
        # for hunting size-independent overhead (phases that do not shrink
        # with more cores cap scaling efficiency)
        marks: list[tuple[str, float]] = []

        def _mark(label: str) -> None:
            marks.append((label, time.time()))

        res = RunResult(run_id=self.ctx.run_id)
        done = self.audit.completed_constraints(self.ctx.run_id) if resume else set()
        parts_done = self.audit.part_results(self.ctx.run_id) if resume else {}
        rows_done = self.audit.stage_rows_checked(self.ctx.run_id) if resume else {}
        _mark("resume_read")

        def hydrate(c: Constraint) -> None:
            for name in getattr(c, "emits", [c.name]):
                recorded = parts_done.get(name, {})
                res.violation_counts[name] = res.violation_counts.get(name, 0) + sum(
                    n for _, n in recorded.values()
                )
                # see run()'s hydrate: rate tolerances and dependency gating
                # need the original denominator on resume
                if c.name in rows_done:
                    res.rows_checked.setdefault(name, rows_done[c.name])
                for p, (s, _) in recorded.items():
                    res.verdicts[(name, p)] = s == "pass"

        todo = []
        for c in constraints:
            if c.name in done:
                res.skipped.append(c.name)
                hydrate(c)
            else:
                todo.append(c)
        if not todo:
            res.wall_sec = time.time() - t_run
            self._apply_severity(res, constraints)
            return res

        table_rows: dict[str, int] = {}
        universes: dict[str, list[str]] = {}
        for c in todo:
            if c.table in tables and c.table not in table_rows:
                table_rows[c.table], universes[c.table] = self._table_stats(
                    tables, c.table
                )
        _mark("table_stats")

        # partition-grain resume (mirrors run()): partition-local constraints
        # with recorded parts recompute only the missing partitions
        stage_pending: dict[str, list[str] | list[None]] = {}
        stage_tables: dict[str, dict[str, DataFrame]] = {}
        live: list[Constraint] = []
        for c in todo:
            universe = universes.get(c.table) or []
            recorded = parts_done.get(c.name, {}) if resume else {}
            if getattr(c, "partition_local", False) and recorded and universe:
                pending = [p for p in universe if p not in recorded]
                hydrate(c)
                if not pending:
                    res.skipped.append(c.name)
                    self.audit.append(
                        [
                            {
                                "run_id": self.ctx.run_id,
                                "constraint": c.name,
                                "part": None,
                                "status": "done",
                                "violation_count": sum(n for _, n in recorded.values()),
                                "rows_checked": table_rows.get(c.table, 0),
                                "wall_sec": 0.0,
                            }
                        ]
                    )
                    continue
                stage_pending[c.name] = pending
                stage_tables[c.name] = {
                    **tables,
                    c.table: tables[c.table].filter(
                        F.col(self.ctx.part_col).isin(pending)
                    ),
                }
            else:
                stage_pending[c.name] = universe or [None]
                stage_tables[c.name] = tables
            live.append(c)
        todo = live
        if not todo:
            res.wall_sec = time.time() - t_run
            self._apply_severity(res, constraints)
            return res

        # Row-local constraints (domain/range/required/composite/mapping)
        # fuse into ONE scan per table: their predicates become an exploded
        # violation-struct array, so the table's columns are read once for
        # the whole family instead of once per constraint. Bundles group by
        # (table, pending-partition set) so a partially-resumed constraint
        # fuses only with stages scanning the same partition subset.
        bundles: dict[tuple, list[Constraint]] = {}
        rest: list[Constraint] = []
        for c in todo:
            preds = getattr(c, "row_predicates", None)
            if preds is not None and c.table in tables and preds(self.ctx) is not None:
                bkey = (c.table, tuple(stage_pending[c.name]))
                bundles.setdefault(bkey, []).append(c)
            else:
                rest.append(c)

        plans = [
            _row_local_bundle_plan(stage_tables[cs[0].name][t], cs, t, self.ctx)
            for (t, _), cs in bundles.items()
        ] + [c.violations(stage_tables[c.name], self.ctx) for c in rest]
        fused = plans[0]
        for p in plans[1:]:
            fused = fused.unionByName(p)

        # The union of P subtrees would persist as the SUM of their output
        # partitions (~800 tiny blocks at bench shape); every downstream
        # pass — count agg, cap window, violating-keys write — then
        # re-schedules that many tasks, and task scheduling is
        # driver-serial: the same wall cost at EVERY parallelism level, a
        # pure scaling-efficiency tax (measured ~2-3s of the local[8]
        # fused wall). One ROUND-ROBIN exchange collapses the cached frame
        # to shuffle_partitions balanced blocks; hashing by constraint
        # here would funnel a large constraint's whole violation set into
        # one cache task — the exact single-task concentration the salted
        # cap below exists to avoid. Violation rows are slim (strings + a
        # long), so the exchange is cheap.
        fused = fused.repartition(_shuffle_partitions(self.spark)).persist()
        try:
            counts_rows = (
                fused.groupBy("constraint", "part")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            _mark("fused_count")
            if self.ctx.collect_violating_keys:
                # UNCAPPED distinct key set off the persisted frame — the
                # quarantine split's row-complete input (the evidence write
                # below is capped and cannot drive one). Same dynamic
                # overwrite discipline: a partial resume replaces only the
                # constraints it recomputed.
                with_retries(
                    lambda: fused.select("constraint", "table", "key", "part")
                    .distinct()
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("constraint")
                    .parquet(os.path.join(self.out_dir, "violating_keys"))
                )
                _mark("violating_keys")
            counts: dict[str, dict] = {
                name: {} for c in todo for name in getattr(c, "emits", [c.name])
            }
            for r in counts_rows:
                counts.setdefault(r["constraint"], {})[r["part"]] = r["n"]
            # capped per-constraint violation rows, one partitioned write.
            # dynamic partition overwrite: only the constraints present in
            # THIS run's output are replaced — a resumed run must not wipe
            # the violation files of stages it skipped.
            #
            # The per-constraint totals are already on the driver, so the
            # cap is applied only when some constraint actually exceeds it
            # — the common all-under-cap run writes the cached frame as-is,
            # no sort, no window. When a constraint IS over cap, a plain
            # window by constraint would funnel its entire violation set
            # (potentially ~1% of 10^12 rows) into ONE sort task; instead
            # the standard two-phase top-k: a salted pre-window keeps at
            # most cap rows per (constraint, salt) in parallel, and the
            # global window ranks only the <= cap * n_salts survivors.
            cap = self.ctx.violation_cap
            order = [F.col("key").asc_nulls_last(), F.col("column").asc_nulls_last()]
            if all(sum(d.values()) <= cap for d in counts.values()):
                capped = fused
            else:
                n_salts = _shuffle_partitions(self.spark)
                pre_w = Window.partitionBy("constraint", "_salt").orderBy(*order)
                w = Window.partitionBy("constraint").orderBy(*order)
                capped = (
                    fused.withColumn(
                        "_salt",
                        F.pmod(F.xxhash64("key", "column"), F.lit(n_salts)),
                    )
                    .withColumn("_prn", F.row_number().over(pre_w))
                    .filter(F.col("_prn") <= cap)
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") <= cap)
                    .drop("_salt", "_prn", "_rn")
                )
            # retried with backoff like run()'s per-stage write (retry.py);
            # the fused violation write lands BEFORE the audit rows below,
            # preserving violations-before-lineage ordering
            with_retries(
                lambda: capped.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("constraint")
                .parquet(os.path.join(self.out_dir, "violations_fused"))
            )
            _mark("capped_write")
        finally:
            fused.unpersist()

        wall = time.time() - t_run
        audit_rows = []
        for c in todo:
            stage_total = 0
            for name in getattr(c, "emits", [c.name]):
                total = sum(counts.get(name, {}).values())
                stage_total += total
                res.violation_counts[name] = res.violation_counts.get(name, 0) + total
                res.rows_checked[name] = table_rows.get(c.table, 0)
                # every part key that actually EMITTED violations gets a
                # lineage row, not just the partition universe: a
                # table-level constraint (e.g. aggregate consistency) emits
                # part=NULL rows, and recording only all-pass universe rows
                # would let a resumed run hydrate the stage back to zero
                # violations — a failed run silently flipping to passing
                name_counts = counts.get(name, {})
                for p in {*stage_pending[c.name], *name_counts}:
                    n = name_counts.get(p, 0)
                    res.verdicts[(name, p)] = n == 0
                    audit_rows.append(
                        {
                            "run_id": self.ctx.run_id,
                            "constraint": name,
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
                    "violation_count": sum(
                        res.violation_counts.get(n, 0)
                        for n in getattr(c, "emits", [c.name])
                    ),
                    "rows_checked": res.rows_checked[c.name],
                    "wall_sec": wall,
                }
            )
        self.audit.append(audit_rows)
        _mark("audit_append")
        res.wall_sec = time.time() - t_run
        if os.environ.get("UNIFY_TIMING") == "1":
            import sys

            prev = t_run
            parts = []
            for label, ts in marks:
                parts.append(f"{label}={ts - prev:.2f}s")
                prev = ts
            print(f"[timing] run_fused: {' '.join(parts)}", file=sys.stderr)
        self._apply_severity(res, constraints)
        return res

    def run_incremental(
        self,
        tables: dict[str, DataFrame],
        constraints: list[Constraint],
        baseline_out_dir: str,
        baseline_run_id: str | None = None,
        fused: bool = True,
        include_binary: bool = True,
    ):
        """Cross-run incremental validation: re-validate only partitions
        whose CONTENT changed since a prior run (plans/incremental.py has
        the full design). Fingerprints this run's tables, diffs against the
        baseline run's saved sidecar, seeds this run's audit with the
        baseline's per-partition verdicts for unchanged partitions of
        partition-local constraints (gated on every auxiliary table being
        fully unchanged), then runs with resume — the existing
        partition-grain resume machinery recomputes exactly the
        changed/added partitions. Global constraints (uniqueness,
        referential, drift) re-run whenever any partition changed (a
        cross-partition duplicate can involve an unchanged partition) —
        but under ZERO diff (no table changed at all) they seed too, and
        the whole re-validation is metadata-only. Violation EVIDENCE rows for
        unchanged partitions remain in the baseline run's out_dir; the
        seeded audit rows carry verdicts + counts forward, so this run's
        verdict matrix and report are complete.

        Saves this run's fingerprints to out_dir so it can chain as the
        next run's baseline. Returns (RunResult, IncrementalPlan)."""
        from unify_spark.plans.incremental import (
            plan_incremental,
            save_fingerprints,
        )

        plan, now_fps, seed_rows = plan_incremental(
            self.spark,
            tables,
            constraints,
            baseline_out_dir,
            part_col=self.ctx.part_col,
            baseline_run_id=baseline_run_id,
            include_binary=include_binary,
        )
        if seed_rows:
            self.audit.append(
                [{"run_id": self.ctx.run_id, **r} for r in seed_rows]
            )
        res = (
            self.run_fused(tables, constraints, resume=True)
            if fused
            else self.run(tables, constraints, resume=True)
        )
        if self.ctx.collect_violating_keys and seed_rows:
            # this run's sidecar only carries RECOMPUTED partitions' keys;
            # seeded partitions' violating keys live in the baseline's
            # sidecar — without this compose, split_valid after an
            # incremental run would silently under-quarantine
            self._compose_seeded_violating_keys(baseline_out_dir, seed_rows)
        save_fingerprints(self.out_dir, now_fps, constraints=constraints)
        return res, plan

    def _compose_seeded_violating_keys(
        self, baseline_out_dir: str, seed_rows: list[dict]
    ) -> None:
        """Copy the baseline's violating keys for every seeded
        (constraint, partition) pair into this run's sidecar, so the run's
        key set is row-complete for the quarantine split. The pair filter
        is a broadcast semi-join against a driver-built frame (seeded pairs
        are metadata-scale)."""
        base_path = os.path.join(baseline_out_dir, "violating_keys")
        if not os.path.exists(base_path):
            raise FileNotFoundError(
                f"no violating_keys sidecar under {baseline_out_dir} — an "
                "incremental run with collect_violating_keys needs the "
                "baseline run to have collected keys too (its seeded "
                "partitions' evidence lives there)"
            )
        base = self.spark.read.parquet(base_path)
        if "part" not in base.columns:
            raise ValueError(
                f"{base_path} predates the partition-aware sidecar schema; "
                "re-run the baseline to enable incremental quarantine"
            )
        pairs = sorted(
            {
                (r["constraint"], r["part"])
                for r in seed_rows
                if r["status"] in ("pass", "fail")
            },
            key=lambda t: (t[0], str(t[1])),
        )
        if not pairs:
            return
        pair_df = self.spark.createDataFrame(
            pairs, "constraint string, part string"
        )
        seeded_keys = base.join(
            F.broadcast(pair_df),
            on=[
                base["constraint"].eqNullSafe(pair_df["constraint"]),
                base["part"].eqNullSafe(pair_df["part"]),
            ],
            how="left_semi",
        )
        with_retries(
            lambda: seeded_keys.select("constraint", "table", "key", "part")
            .write.mode("append")
            .partitionBy("constraint")
            .parquet(os.path.join(self.out_dir, "violating_keys"))
        )

    def verdict_matrix(self) -> DataFrame:
        return self.audit.verdicts(self.ctx.run_id)

    # -- sampled-constraint extrapolation -------------------------------------

    def sampling_estimates(
        self,
        tables: dict[str, DataFrame],
        constraints: list[Constraint],
        res,
    ) -> dict[str, dict]:
        """Extrapolate sampled constraints' violation counts to the full
        table: per emitted constraint name, the sampled violation rate, a
        Wilson 95% interval on the true rate, and the implied total-count
        band. Cost: two single-column counts per sampled constraint
        (metadata-scale next to the decode the sample skipped). Empty when
        no constraint ran in sampled mode."""
        from unify_spark.functions.sampling import wilson_interval

        out: dict[str, dict] = {}
        for c in constraints:
            if not getattr(c, "is_sampled", False):
                continue
            df = tables[c.table]
            n_total = df.count()
            n_sampled = df.where(c._keep()).count()
            for name in getattr(c, "emits", [c.name]):
                if name in res.errors:
                    continue  # stage died — counts aren't a sample of anything
                k = res.violation_counts.get(name, 0)
                lo, hi = wilson_interval(k, n_sampled)
                out[name] = {
                    "sample_rate": c.sample_rate,
                    "sampled_rows": n_sampled,
                    "total_rows": n_total,
                    "sampled_violations": k,
                    "violation_rate": (k / n_sampled) if n_sampled else None,
                    "estimated_total_violations": (
                        int(round(k / n_sampled * n_total)) if n_sampled else None
                    ),
                    "wilson95_rate": [lo, hi],
                    "wilson95_total": [int(lo * n_total), math.ceil(hi * n_total)],
                }
        return out

    # -- quarantine split -----------------------------------------------------

    def violating_keys(self) -> DataFrame:
        """The run's UNCAPPED distinct (constraint, table, key) sidecar —
        written when ``ctx.collect_violating_keys`` is set. A FULLY CLEAN
        per-stage run writes no files (run() guards its sink behind
        ``if total:``, and an empty partitioned parquet would not even be
        schema-readable), so when this runner collects violating keys and
        the sidecar is absent/empty the honest answer is an empty key set —
        every row routes to clean — not an error (advisor round-5 fix).
        The error remains for runners that never collected keys at all."""
        path = os.path.join(self.out_dir, "violating_keys")
        schema = "constraint string, table string, key string, part string"
        if os.path.exists(path):
            try:
                return self.spark.read.parquet(path)
            except Exception:
                # directory exists but holds no readable files (clean run
                # under the fused path writes at least the _SUCCESS marker)
                if self.ctx.collect_violating_keys:
                    return self.spark.createDataFrame([], schema)
                raise
        if self.ctx.collect_violating_keys:
            return self.spark.createDataFrame([], schema)
        raise FileNotFoundError(
            f"no violating_keys sidecar under {self.out_dir} — run with "
            "ValidationContext(collect_violating_keys=True) (CLI: "
            "--quarantine-to)"
        )

    def split_valid(
        self,
        df: DataFrame,
        table: str,
        key_col: str,
        constraints: list[Constraint] | None = None,
        exclude: tuple[str, ...] = (),
    ) -> tuple[DataFrame, DataFrame]:
        """(clean, quarantined): partition ``df`` by whether the row's key
        appears in this run's violating-key set for ``table`` — the
        expect-or-drop pattern (route bad rows to quarantine, ship the
        clean table) without recomputing any constraint.

        Partition-grain constraints (drift) key violations by PARTITION,
        not row key, so they are excluded automatically when
        ``constraints`` is supplied (and can be excluded by name via
        ``exclude``): a drifted partition is an alerting signal, not a
        per-row defect. Rows whose violation key is NULL cannot be
        row-addressed and do not quarantine (their constraints still fail
        the run). The two outputs partition ``df`` exactly: every input
        row lands in exactly one side.

        Scale shape: the keys side is the (usually small) violation set —
        Catalyst broadcasts it under AQE when it fits; the big table is
        never shuffled for the anti/semi pair beyond that join."""
        drop = set(exclude)
        if constraints is not None:
            for c in constraints:
                if getattr(c, "partition_grain", False):
                    drop.update(getattr(c, "emits", [c.name]))
        keys = self.violating_keys().filter(F.col("table") == table)
        if drop:
            keys = keys.filter(~F.col("constraint").isin(list(drop)))
        keys = keys.select(F.col("key").alias("__vk")).distinct()
        # the sidecar stores keys as STRINGS; a bare equality against e.g. a
        # bigint key column would compare via double and lose precision
        # above 2^53 — cast the frame's key explicitly so routing is exact
        # at any id scale (advisor round-5 fix)
        cond = df[key_col].cast("string") == F.col("__vk")
        clean = df.join(keys, on=cond, how="left_anti")
        quarantined = df.join(keys, on=cond, how="left_semi")
        return clean, quarantined

    # -- cross-run drift sidecars --------------------------------------------

    def persist_drift_histograms(
        self, tables: dict[str, DataFrame], constraints: list[Constraint]
    ) -> int:
        """Write this run's per-partition histograms for every bounded
        DriftConstraint to <out>/drift_hist — the persisted-baseline sidecar
        a LATER run scores itself against without touching this run's data
        (drift.py histogram_rows). Returns the number of constraints
        persisted. Bounded constraints only: stable bins across runs need
        contract bounds."""
        from unify_spark.operators.drift import (
            CategoricalDriftConstraint,
            DriftConstraint,
        )

        drifts = [
            c for c in constraints if isinstance(c, DriftConstraint) and c.bounds
        ]
        if drifts:
            out = drifts[0].histogram_rows(tables, self.ctx)
            for c in drifts[1:]:
                out = out.unionByName(c.histogram_rows(tables, self.ctx))
            with_retries(
                lambda: out.coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(self.out_dir, "drift_hist"))
            )
        # categorical sidecar: same contract (stable buckets need declared
        # categories), separate file — the schemas differ (val string vs
        # bucket long)
        cats = [
            c
            for c in constraints
            if isinstance(c, CategoricalDriftConstraint) and c.categories
        ]
        if cats:
            out = cats[0].histogram_rows(tables, self.ctx)
            for c in cats[1:]:
                out = out.unionByName(c.histogram_rows(tables, self.ctx))
            with_retries(
                lambda: out.coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(self.out_dir, "cat_drift_hist"))
            )
        return len(drifts) + len(cats)

    def drift_vs_baseline(
        self,
        tables: dict[str, DataFrame],
        constraints: list[Constraint],
        baseline_dir: str,
    ) -> DataFrame:
        """Score every bounded DriftConstraint's CURRENT partitions against
        a PRIOR run's persisted histograms (<baseline_dir>/drift_hist):
        (constraint, part, psi, ks, ks_crit, failed) rows. The baseline side
        is a ≤ n_bins-row broadcast per constraint — cross-run drift costs
        one histogram pass over the new data, never a rescan of the old."""
        from unify_spark.operators.drift import (
            CategoricalDriftConstraint,
            DriftConstraint,
        )

        drifts = [
            c for c in constraints if isinstance(c, DriftConstraint) and c.bounds
        ]
        cats = [
            c
            for c in constraints
            if isinstance(c, CategoricalDriftConstraint) and c.categories
        ]
        if not drifts and not cats:
            raise ValueError(
                "no bounded DriftConstraint or categories-declared "
                "CategoricalDriftConstraint in the plan to baseline"
            )
        out = None
        if drifts:
            baseline = self.spark.read.parquet(
                os.path.join(baseline_dir, "drift_hist")
            )
            for c in drifts:
                scored = c.scores_vs_baseline(tables, self.ctx, baseline).select(
                    F.lit(c.name).alias("constraint"),
                    "part",
                    "psi",
                    "ks",
                    "ks_crit",
                    "failed",
                )
                out = scored if out is None else out.unionByName(scored)
        if cats:
            cat_baseline = self.spark.read.parquet(
                os.path.join(baseline_dir, "cat_drift_hist")
            )
            for c in cats:
                # categorical rows carry null ks/ks_crit (KS is undefined
                # for unordered categories); new_categories folds into the
                # shared verdict via `failed`
                scored = c.scores_vs_baseline(tables, self.ctx, cat_baseline).select(
                    F.lit(c.name).alias("constraint"),
                    "part",
                    "psi",
                    F.lit(None).cast("double").alias("ks"),
                    F.lit(None).cast("double").alias("ks_crit"),
                    "failed",
                )
                out = scored if out is None else out.unionByName(scored)
        return out


def _row_local_bundle_plan(df, constraints, table, ctx):
    """One-scan fused plan for a table's row-local constraints: per row, an
    array of violation structs (one slot per failing predicate), compacted
    and exploded into canonical VIOLATION_SCHEMA rows."""
    key = "clip_id" if "clip_id" in df.columns else df.columns[0]
    part_col = ctx.part_col if ctx.part_col in df.columns else None
    structs = []
    for c in constraints:
        for fail, column, observed, expected in c.row_predicates(ctx):
            structs.append(
                F.when(
                    fail,
                    F.struct(
                        F.lit(c.name).alias("constraint"),
                        F.lit(column).alias("column"),
                        observed.cast("string").alias("observed"),
                        F.lit(expected).alias("expected"),
                    ),
                )
            )
    exploded = df.select(
        F.col(key).cast("string").alias("key"),
        (F.col(part_col) if part_col else F.lit(None)).cast("string").alias("part"),
        F.explode(F.array_compact(F.array(*structs))).alias("v"),
    )
    return exploded.select(
        F.col("v.constraint").alias("constraint"),
        F.lit(table).alias("table"),
        F.col("key"),
        F.col("v.column").alias("column"),
        F.col("v.observed").alias("observed"),
        F.col("v.expected").alias("expected"),
        F.col("part"),
        F.lit(None).cast("string").alias("source_file"),
        F.lit(None).cast("long").alias("row_index"),
    )


def _safe(name: str) -> str:
    return "".join(ch if ch.isalnum() or ch in "._-" else "_" for ch in name)
