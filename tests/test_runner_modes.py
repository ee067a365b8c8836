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
