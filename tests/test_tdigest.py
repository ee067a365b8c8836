"""t-digest sketch: accuracy vs exact quantiles, mergeability, distributed build."""

import numpy as np
import pytest

from unify_spark.operators import tdigest as td


def test_accuracy_vs_exact():
    rng = np.random.Generator(np.random.PCG64(3))
    v = rng.lognormal(8.0, 0.6, size=50_000)
    d = td.build(v, compression=100)
    assert d.means.size < 250  # bounded state
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        exact = float(np.quantile(v, q))
        est = td.quantile(d, q)
        assert abs(est - exact) / exact < 0.02, (q, est, exact)


def test_merge_equivalence():
    rng = np.random.Generator(np.random.PCG64(4))
    v = rng.normal(100.0, 15.0, size=40_000)
    whole = td.build(v, compression=100)
    parts = [td.build(c, compression=100) for c in np.array_split(v, 8)]
    merged = td.merge(parts, compression=100)
    for q in (0.1, 0.5, 0.9):
        assert abs(td.quantile(merged, q) - td.quantile(whole, q)) < 1.5


def test_edge_cases():
    assert np.isnan(td.quantile(td.build(np.array([])), 0.5))
    single = td.build(np.array([42.0]))
    assert td.quantile(single, 0.5) == 42.0
    const = td.build(np.full(1000, 7.0))
    assert td.quantile(const, 0.9) == pytest.approx(7.0)


def test_distributed_sketch(spark, audio_tables):
    import pyspark.sql.functions as F

    digests = td.sketch_column(audio_tables["clips"], "dur_ms", part_col="part_date")
    assert set(digests) >= {"*"}
    est_p50 = td.quantile(digests["*"], 0.5)
    exact_p50 = audio_tables["clips"].select(
        F.expr("percentile(dur_ms, 0.5)").alias("p")
    ).collect()[0]["p"]
    assert abs(est_p50 - exact_p50) / exact_p50 < 0.03
    # the drift partition (doubled durations) must show a higher median
    p_parts = {p: td.quantile(d, 0.5) for p, d in digests.items() if p != "*"}
    drift_part = max(p_parts, key=p_parts.get)
    assert drift_part == "2025-01-08"
    assert p_parts[drift_part] > 1.5 * min(p_parts.values())


def test_distributed_sketch_with_empty_partitions(spark):
    """An empty input partition must not break the Arrow partial-sketch pass
    (regression: an empty dict-built DataFrame defaults every column to
    float64 and pyarrow raises ArrowNotImplementedError converting it to the
    array<double> sketch slots — first seen on the sf0.1 lineitem layout)."""
    df = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b") for i in range(6)], "v double, part string"
    ).repartition(16)  # 16 partitions, 6 rows: >= 10 empty partitions
    digests = td.sketch_column(df, "v", part_col="part")
    assert set(digests) == {"a", "b", "*"}
    assert td.quantile(digests["*"], 0.5) == pytest.approx(2.5, abs=1.0)
    # all-null column: every task is empty after the null filter; the
    # degenerate result is the defined empty digest, not an Arrow crash
    nulls = spark.createDataFrame(
        [(None, "a")] * 4, "v double, part string"
    ).repartition(4)
    empty = td.sketch_column(nulls, "v", part_col="part")
    assert np.isnan(td.quantile(empty["*"], 0.5))


def test_tdigest_sidecar_rows_incremental(spark, tmp_path):
    """Persisted per-partition digest rows answer quantiles over any
    partition subset, and a new partition is absorbed by appending its row."""
    import numpy as np

    from unify_spark.operators import tdigest as td

    rng = np.random.Generator(np.random.PCG64(5))
    rows = [(float(v), p) for p in ("p1", "p2") for v in rng.normal(100, 10, 4000)]
    df = spark.createDataFrame(rows, ["dur_ms", "part_date"])
    path = str(tmp_path / "td")
    td.sketch_rows(df, "dur_ms", "clips", part_col="part_date").write.mode(
        "overwrite"
    ).parquet(path)

    stored = spark.read.parquet(path)
    got = td.quantile_from_rows(stored, [0.5])[("clips", "dur_ms")][0]
    exact = float(np.median(np.array([r[0] for r in rows])))
    assert abs(got - exact) < 0.5

    # new partition with a shifted distribution appends one row; merged
    # median moves accordingly without touching p1/p2 data
    new = spark.createDataFrame(
        [(float(v), "p3") for v in rng.normal(200, 10, 8000)], ["dur_ms", "part_date"]
    )
    td.sketch_rows(new, "dur_ms", "clips", part_col="part_date").write.mode(
        "append"
    ).parquet(path)
    stored2 = spark.read.parquet(path)
    merged = td.quantile_from_rows(stored2, [0.5])[("clips", "dur_ms")][0]
    assert merged > got + 20  # median pulled toward the new mode
    only_p3 = td.quantile_from_rows(stored2, [0.5], parts=["p3"])[("clips", "dur_ms")][0]
    assert abs(only_p3 - 200) < 2
