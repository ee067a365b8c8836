"""Metric-history anomaly detection (plans/history.py): median ± k·MAD
over the trailing runs' profile sidecars."""

import os

import pytest

from unify_spark.plans.history import history_anomalies

_SCHEMA = "table string, part string, column string, stat string, value string"


def _write_profile(spark, out_dir, values: dict[tuple[str, str, str], float]):
    rows = [(t, "*", c, s, str(v)) for (t, c, s), v in values.items()]
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "profile")
    )
    return out_dir


def _dirs(spark, tmp_path, series: list[dict]):
    out = []
    for i, vals in enumerate(series):
        out.append(_write_profile(spark, str(tmp_path / f"r{i}"), vals))
    return out


def test_mad_envelope_flags_outlier(spark, tmp_path):
    key = ("clips", "dur_ms", "max")
    noise = [29_990.0, 30_010.0, 29_995.0, 30_005.0, 30_000.0]
    dirs = _dirs(
        spark, tmp_path, [{key: v} for v in noise] + [{key: 45_000.0}]
    )
    anomalies = history_anomalies(spark, dirs)
    assert len(anomalies) == 1
    a = anomalies[0]
    assert (a["table"], a["column"], a["stat"]) == key
    assert a["value"] == 45_000.0 and a["z"] > 4 and a["history_n"] == 5

    # the same history with an in-envelope current value: clean
    dirs_ok = _dirs(spark, tmp_path / "ok", [{key: v} for v in noise] + [{key: 30_008.0}])
    assert history_anomalies(spark, dirs_ok) == []


def test_bit_stable_history_exact_change(spark, tmp_path):
    """MAD == 0 (healthy-pipeline row counts): any change is an anomaly,
    identity is clean."""
    key = ("clips", "*", "rows")
    dirs = _dirs(spark, tmp_path, [{key: 10_000.0}] * 4 + [{key: 10_001.0}])
    (a,) = history_anomalies(spark, dirs)
    assert a["z"] is None and a["mad"] == 0.0 and a["value"] == 10_001.0
    dirs_same = _dirs(spark, tmp_path / "same", [{key: 10_000.0}] * 5)
    assert history_anomalies(spark, dirs_same) == []


def test_min_history_and_missing_metrics(spark, tmp_path):
    key = ("clips", "codec", "null_rate")
    new_key = ("clips", "codec", "approx_distinct")
    # only 2 prior observations -> below min_history, never flagged
    dirs = _dirs(spark, tmp_path, [{key: 0.0}, {key: 0.0}, {key: 0.9}])
    assert history_anomalies(spark, dirs) == []
    # a metric that only exists in the current run is skipped (no basis)
    dirs2 = _dirs(
        spark, tmp_path / "m",
        [{key: 0.0}] * 4 + [{key: 0.0, new_key: 7.0}],
    )
    assert history_anomalies(spark, dirs2) == []
    with pytest.raises(ValueError):
        history_anomalies(spark, dirs[:1])
    with pytest.raises(FileNotFoundError):
        history_anomalies(spark, [dirs[0], str(tmp_path / "nope")])


def test_cli_history_chain(spark, fixture_dir, tmp_path, capsys):
    """Real chain: three profiled validate runs on the same data (stable
    history), a fourth on mutated data -> its null rate trips the check."""
    import json as _json

    from pyspark.sql import functions as F

    from unify_spark import cli
    from unify_spark.plans import ValidationRunner, load_audio_tables
    from unify_spark.operators.base import ValidationContext

    tables = load_audio_tables(spark, fixture_dir)
    dirs = []
    for i in range(3):
        out = str(tmp_path / f"h{i}")
        r = ValidationRunner(
            spark, out, ValidationContext(run_id=f"h{i}", payload_cap_ms=50)
        )
        r.profile(tables, sketches=False)
        dirs.append(out)
    mutated = {
        **tables,
        "clips": tables["clips"].withColumn(
            "codec",
            F.when(F.rand(7) < 0.5, F.lit(None)).otherwise(F.col("codec")),
        ),
    }
    out4 = str(tmp_path / "h3")
    ValidationRunner(
        spark, out4, ValidationContext(run_id="h3", payload_cap_ms=50)
    ).profile(mutated, sketches=False)

    rc = cli.main(["history-anomalies", "--runs", *dirs, out4])
    rep = _json.loads(capsys.readouterr().out)
    assert rc == 1
    flagged = {(a["table"], a["column"], a["stat"]) for a in rep["anomalies"]}
    assert ("clips", "codec", "null_rate") in flagged

    rc_ok = cli.main(["history-anomalies", "--runs", *dirs, dirs[-1]])
    rep_ok = _json.loads(capsys.readouterr().out)
    assert rc_ok == 0 and rep_ok["n_anomalies"] == 0
