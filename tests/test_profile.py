"""Stats profiler: long-format output, per-partition + global rows, and the
runner's metrics sidecar."""

import pytest
from pyspark.sql import functions as F

from unify_spark.operators import profile_table


@pytest.fixture(scope="module")
def stats(spark, audio_tables):
    return profile_table(
        audio_tables["clips"], "clips", part_col="part_date", exclude=["bytes"]
    ).collect()


def test_profile_shape(stats, manifest):
    rows = {(r["part"], r["column"], r["stat"]): r["value"] for r in stats}
    n_rows_global = int(rows[("*", "*", "rows")])
    assert n_rows_global == manifest["n_rows"] + len(manifest["uniqueness_clip_ids"])
    # per-partition rows exist for every partition
    parts = {r["part"] for r in stats if r["part"] != "*"}
    assert len(parts) == manifest["n_parts"]


def test_profile_null_rate_and_minmax(stats, manifest):
    rows = {(r["part"], r["column"], r["stat"]): r["value"] for r in stats}
    total = int(rows[("*", "*", "rows")])
    null_rate = float(rows[("*", "transcript", "null_rate")])
    assert null_rate == pytest.approx(4 / total, rel=1e-6)  # 4 injected nulls
    assert float(rows[("*", "dur_ms", "min")]) == 0.0  # injected dur=0
    assert float(rows[("*", "dur_ms", "max")]) == 40000.0  # injected dur=40000
    # quantiles present as an array string
    assert rows[("*", "dur_ms", "quantiles")].startswith("[")


def test_profile_approx_distinct(stats, manifest):
    rows = {(r["part"], r["column"], r["stat"]): r["value"] for r in stats}
    approx = int(rows[("*", "clip_id", "approx_distinct")])
    assert abs(approx - manifest["n_rows"]) / manifest["n_rows"] < 0.05


def test_runner_profile_sidecar(spark, audio_tables, tmp_path):
    from unify_spark.operators.base import ValidationContext
    from unify_spark.plans import ValidationRunner

    runner = ValidationRunner(spark, str(tmp_path), ValidationContext(run_id="p"))
    runner.profile({"clips": audio_tables["clips"]})
    import os

    stats = spark.read.parquet(os.path.join(str(tmp_path), "profile"))
    assert stats.filter(
        (F.col("column") == "sr_hz") & (F.col("stat") == "quantiles")
    ).count() > 0
    assert "bytes" not in {r["column"] for r in stats.select("column").distinct().collect()}


def test_hll_sketches_merge_and_incremental(spark, tmp_path):
    """Persisted per-partition HLL sketches union to (approximately) the
    global distinct count, subset-select works, and a NEW partition is
    absorbed by appending its sketch rows — no rescan of old partitions."""
    from pyspark.sql import functions as F

    from unify_spark.operators.profile import hll_estimate, hll_sketches

    rows = [(f"id-{i % 400}", f"u{i % 37}", p) for p in ("p1", "p2") for i in range(2000)]
    df = spark.createDataFrame(rows, ["clip_id", "user", "part_date"])
    sk = hll_sketches(df, "clips", ["clip_id", "user"], part_col="part_date")
    path = str(tmp_path / "sketches")
    sk.write.mode("overwrite").parquet(path)

    stored = spark.read.parquet(path)
    est = {r["column"]: r["approx_distinct"] for r in hll_estimate(stored).collect()}
    assert abs(est["clip_id"] - 400) / 400 < 0.05
    assert abs(est["user"] - 37) / 37 < 0.05

    only_p1 = {r["column"]: r["approx_distinct"]
               for r in hll_estimate(stored, parts=["p1"]).collect()}
    assert abs(only_p1["clip_id"] - 400) / 400 < 0.05

    # incremental: p3 arrives with 100 brand-new ids; append ONLY its sketch
    new = spark.createDataFrame(
        [(f"new-{i}", "u0", "p3") for i in range(100)], ["clip_id", "user", "part_date"]
    )
    hll_sketches(new, "clips", ["clip_id", "user"], part_col="part_date").write.mode(
        "append"
    ).parquet(path)
    est2 = {r["column"]: r["approx_distinct"]
            for r in hll_estimate(spark.read.parquet(path)).collect()}
    assert abs(est2["clip_id"] - 500) / 500 < 0.05


def test_drift_vs_persisted_baseline(spark, tmp_path):
    """Cross-run drift: a later run's partitions are scored against a prior
    run's PERSISTED histogram rows; shifted distributions fail, matching
    ones pass, and the prior run's data is never re-read."""
    import numpy as np

    from unify_spark.operators.base import ValidationContext
    from unify_spark.operators.drift import DriftConstraint

    rng = np.random.Generator(np.random.PCG64(9))
    ctx = ValidationContext()
    c = DriftConstraint("clips", "dur_ms", bounds=(0, 300))

    base_rows = [(float(v), p) for p in ("p1", "p2")
                 for v in rng.normal(150, 20, 3000).clip(1, 299)]
    baseline_df = spark.createDataFrame(base_rows, ["dur_ms", "part_date"])
    path = str(tmp_path / "hist")
    c.histogram_rows({"clips": baseline_df}, ctx).write.mode("overwrite").parquet(path)

    cur_rows = [(float(v), "p3") for v in rng.normal(150, 20, 3000).clip(1, 299)]
    cur_rows += [(float(v), "p4") for v in rng.normal(60, 10, 3000).clip(1, 299)]
    cur = spark.createDataFrame(cur_rows, ["dur_ms", "part_date"])

    baseline = spark.read.parquet(path)
    scores = {r["part"]: r["failed"]
              for r in c.scores_vs_baseline({"clips": cur}, ctx, baseline).collect()}
    assert scores == {"p3": False, "p4": True}


def test_drift_baseline_requires_bounds(spark):
    import pytest as _pytest

    from unify_spark.operators.base import ValidationContext
    from unify_spark.operators.drift import DriftConstraint

    c = DriftConstraint("clips", "dur_ms")  # no bounds
    df = spark.createDataFrame([(1.0, "p1")], ["dur_ms", "part_date"])
    with _pytest.raises(ValueError, match="bounds"):
        c.histogram_rows({"clips": df}, ValidationContext())
