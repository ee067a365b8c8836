"""Fused vs staged execution equivalence + resume semantics."""

import pytest

from unify_spark.operators.base import ValidationContext
from unify_spark.plans import ValidationRunner, audio_suite


def test_fused_equals_staged(spark, audio_tables, manifest, tmp_path):
    ctx_a = ValidationContext(run_id="staged", payload_cap_ms=50)
    staged = ValidationRunner(spark, str(tmp_path / "a"), ctx_a).run(
        audio_tables, audio_suite(), resume=False
    )
    ctx_b = ValidationContext(run_id="fused", payload_cap_ms=50)
    fused = ValidationRunner(spark, str(tmp_path / "b"), ctx_b).run_fused(
        audio_tables, audio_suite(), resume=False
    )
    assert fused.violation_counts == staged.violation_counts
    assert fused.verdicts == staged.verdicts


def test_fused_resume_skips_everything(spark, audio_tables, tmp_path):
    ctx = ValidationContext(run_id="fused-resume", payload_cap_ms=50)
    runner = ValidationRunner(spark, str(tmp_path), ctx)
    first = runner.run_fused(audio_tables, audio_suite(), resume=True)
    assert not first.skipped
    second = runner.run_fused(audio_tables, audio_suite(), resume=True)
    assert len(second.skipped) == len(audio_suite())
    # resumed runs hydrate prior results from the audit: same counts, same
    # pass/fail outcome (a failed dataset must NOT re-report as clean)
    assert second.violation_counts == first.violation_counts
    assert second.passed == first.passed


def test_staged_resume_and_fail_fast(spark, audio_tables, tmp_path):
    ctx = ValidationContext(run_id="ff", payload_cap_ms=50, fail_fast=True)
    runner = ValidationRunner(spark, str(tmp_path), ctx)
    res = runner.run(audio_tables, audio_suite(), resume=False)
    # fail-fast: first failing stage (uniqueness) kills the run
    assert len(res.violation_counts) == 1
    assert next(iter(res.violation_counts)).startswith("uniqueness:")


def test_stage_error_trapped_and_reported(spark, tmp_path):
    """Uncaught-exception trap: a throwing stage becomes an 'error' audit row
    and res.errors; other stages still run; passed is False."""
    from unify_spark.operators.base import Constraint
    from unify_spark.operators.constraints import RangeConstraint

    class Boom(Constraint):
        name = "boom:t"
        table = "t"

        def violations(self, tables, ctx):
            raise RuntimeError("kapow")

    df = spark.createDataFrame([("a", 1.0, "p1")], ["clip_id", "val", "part_date"])
    runner = ValidationRunner(spark, str(tmp_path), ValidationContext(run_id="e"))
    res = runner.run({"t": df}, [Boom(), RangeConstraint("t", "val", min_value=0.0)])
    assert res.errors == {"boom:t": "RuntimeError: kapow"}
    assert not res.passed and res.total_violations == 0
    assert ("range:t.val", "p1") in res.verdicts  # other stage completed
    audit = runner.audit.read().filter("status = 'error'").collect()
    assert [r["constraint"] for r in audit] == ["boom:t"]


def test_write_partitioned_batch_rows_contract(spark, tmp_path):
    import glob

    from unify_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame(
        [(i, "p%d" % (i % 2)) for i in range(100)], ["x", "part"]
    ).coalesce(1)
    out = str(tmp_path / "batched")
    write_partitioned(df, out, ["part"], batch_rows=10)
    files = glob.glob(out + "/part=*/*.parquet")
    assert len(files) >= 10  # 100 rows / 10-per-file across 2 partitions
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        write_partitioned(df, out, ["part"], batch_rows=0)


def test_audit_append_retries_transient_failures(spark, tmp_path, monkeypatch):
    from unify_spark.plans.audit import AuditLog

    audit = AuditLog(spark, str(tmp_path / "audit"))
    calls = {"n": 0}
    real = AuditLog._append_once

    def flaky(self, rows, batch, is_retry=False):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient store hiccup")
        return real(self, rows, batch, is_retry)

    monkeypatch.setattr(AuditLog, "_append_once", flaky)
    audit.append(
        [{"run_id": "r", "constraint": "c", "part": None, "status": "done",
          "violation_count": 0}],
        backoff_s=0.01,
    )
    assert calls["n"] == 3
    assert audit.completed_constraints("r") == {"c"}


def test_audit_append_idempotent_under_ambiguous_failure(spark, tmp_path, monkeypatch):
    """An append whose write COMMITTED but whose ack was lost must not
    double lineage on retry: the batch_id is minted once per append(), so
    the retry rewrites the same batch file instead of adding a second."""
    from unify_spark.plans.audit import AuditLog

    audit = AuditLog(spark, str(tmp_path / "audit"))
    calls = {"n": 0}
    real = AuditLog._append_once

    def committed_but_unacked(self, rows, batch, is_retry=False):
        calls["n"] += 1
        real(self, rows, batch, is_retry)  # the write lands...
        if calls["n"] == 1:
            raise OSError("ack lost")      # ...but the caller never hears
        return None

    monkeypatch.setattr(AuditLog, "_append_once", committed_but_unacked)
    audit.append(
        [{"run_id": "r", "constraint": "c", "part": "p0", "status": "pass",
          "violation_count": 0}],
        backoff_s=0.01,
    )
    assert calls["n"] == 2
    rows = audit.read().collect()
    assert len(rows) == 1                     # no duplicate lineage row
    assert len({r["batch_id"] for r in rows}) == 1


def test_violation_write_retries_transient_failures(spark, tmp_path, monkeypatch):
    """A transient sink failure during the violation parquet write is
    retried with backoff instead of aborting the stage (retry.py taxonomy;
    reference transact.clj:46-82)."""
    from pyspark.sql import functions as F

    from unify_spark.operators.base import ValidationContext
    from unify_spark.operators.constraints import RangeConstraint
    from unify_spark.plans import ValidationRunner
    from unify_spark.plans import retry as retry_mod

    df = spark.createDataFrame([(1, -5.0), (2, 3.0)], ["k", "v"])
    calls = {"n": 0}
    real = retry_mod.with_retries

    def flaky_once(fn, **kw):
        def wrapped():
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("transient object-store hiccup")
            return fn()

        return real(wrapped, base_backoff_s=0.01)

    import unify_spark.plans.runner as runner_mod

    monkeypatch.setattr(runner_mod, "with_retries", flaky_once)
    runner = ValidationRunner(spark, str(tmp_path / "out"), ValidationContext(run_id="rt"))
    res = runner.run(
        {"t": df}, [RangeConstraint("t", "v", min_value=0)], resume=False
    )
    assert calls["n"] >= 2  # first attempt failed, retry succeeded
    assert res.violation_counts and sum(res.violation_counts.values()) == 1
    vio = spark.read.parquet(str(tmp_path / "out" / "violations" / "range_t.v"))
    assert vio.count() == 1


def test_retry_taxonomy_fatal_not_retried():
    import pytest

    from unify_spark.plans.retry import retryable, with_retries

    assert retryable(OSError("disk wobble"))
    assert retryable(RuntimeError("java.io.IOException: connection reset by peer"))
    assert not retryable(ValueError("bad plan"))

    # deterministic OSError subclasses must NOT retry — each retry re-runs a
    # whole Spark sink job while the real error (missing path, permission,
    # full disk) is delayed by the backoff schedule
    import errno

    assert not retryable(FileNotFoundError("gone"))
    assert not retryable(PermissionError("denied"))
    assert not retryable(IsADirectoryError("dir"))
    assert not retryable(NotADirectoryError("file"))
    enospc = OSError(errno.ENOSPC, "No space left on device")
    assert not retryable(enospc)

    calls = {"n": 0}

    def fatal():
        calls["n"] += 1
        raise ValueError("logic error")

    with pytest.raises(ValueError):
        with_retries(fatal, base_backoff_s=0.001)
    assert calls["n"] == 1  # fatal → no retries
