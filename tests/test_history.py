"""Metric-history anomaly detection (plans/history.py): median ± k·MAD
over the trailing runs' profile sidecars, and the cross-run
MetricsRepository / verdict-matrix-diff layer on top."""

import os

import pytest

from unify_spark.plans.history import (
    MetricsRepository,
    history_anomalies,
    repo_anomalies,
)

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


def test_metrics_repo_roundtrip_and_anomalies(spark, tmp_path):
    """One append-mode table spanning runs: runs() orders by append time,
    repo_anomalies reproduces the run-dir envelope from a single scan, and
    run_id / max_history select the scored point and window."""
    repo = MetricsRepository(spark, str(tmp_path / "repo"))
    assert repo.runs() == [] and repo.read().count() == 0

    key = ("clips", "dur_ms", "max")
    noise = [29_990.0, 30_010.0, 29_995.0, 30_005.0, 30_000.0]
    for i, v in enumerate(noise):
        repo.append([("clips", "*", "dur_ms", "max", str(v))], f"r{i}")
    repo.append([("clips", "*", "dur_ms", "max", "45000.0")], "r5")
    assert repo.runs() == [f"r{i}" for i in range(6)]

    anomalies = repo_anomalies(repo)  # default: newest run
    assert len(anomalies) == 1
    a = anomalies[0]
    assert (a["table"], a["column"], a["stat"]) == key
    assert a["value"] == 45_000.0 and a["z"] > 4 and a["history_n"] == 5

    # scoring an in-envelope earlier run against ITS priors: clean
    assert repo_anomalies(repo, run_id="r4") == []
    # a trailing window too small for min_history: nothing has a basis
    assert repo_anomalies(repo, max_history=2, min_history=3) == []

    with pytest.raises(ValueError):
        repo_anomalies(repo, run_id="r0")  # no prior history
    with pytest.raises(ValueError):
        repo_anomalies(repo, run_id="nope")
    with pytest.raises(ValueError):
        repo_anomalies(MetricsRepository(spark, str(tmp_path / "empty")))

    # per-partition and non-scalar rows are stored but excluded from the
    # global envelope input
    repo2 = MetricsRepository(spark, str(tmp_path / "repo2"))
    repo2.append(
        [
            ("clips", "*", "dur_ms", "quantiles", "[1.0,2.0]"),
            ("clips", "2024-01-01", "dur_ms", "max", "99.0"),
            ("clips", "*", "dur_ms", "max", "1.0"),
        ],
        "rA",
    )
    assert repo2.global_stats() == {"rA": {key: 1.0}}
    assert repo2.read().count() == 3


def test_profile_appends_to_metrics_repo(spark, fixture_dir, tmp_path, capsys):
    """runner.profile(metrics_repo=...) tags this run's stat rows into the
    shared repo, and the CLI scores it via --repo (single-table history)."""
    import json as _json

    from pyspark.sql import functions as F

    from unify_spark import cli
    from unify_spark.operators.base import ValidationContext
    from unify_spark.plans import ValidationRunner, load_audio_tables

    repo_path = str(tmp_path / "repo")
    tables = load_audio_tables(spark, fixture_dir)
    for i in range(3):
        ValidationRunner(
            spark, str(tmp_path / f"h{i}"),
            ValidationContext(run_id=f"h{i}", payload_cap_ms=50),
        ).profile(tables, sketches=False, metrics_repo=repo_path)
    mutated = {
        **tables,
        "clips": tables["clips"].withColumn(
            "codec",
            F.when(F.rand(7) < 0.5, F.lit(None)).otherwise(F.col("codec")),
        ),
    }
    ValidationRunner(
        spark, str(tmp_path / "h3"), ValidationContext(run_id="h3", payload_cap_ms=50)
    ).profile(mutated, sketches=False, metrics_repo=repo_path)

    repo = MetricsRepository(spark, repo_path)
    assert repo.runs() == ["h0", "h1", "h2", "h3"]
    # the per-run sidecar still exists alongside the repo rows
    assert os.path.exists(os.path.join(str(tmp_path / "h0"), "profile"))

    rc = cli.main(["history-anomalies", "--repo", repo_path])
    rep = _json.loads(capsys.readouterr().out)
    assert rc == 1 and rep["current"] == "h3"
    flagged = {(a["table"], a["column"], a["stat"]) for a in rep["anomalies"]}
    assert ("clips", "codec", "null_rate") in flagged

    rc_ok = cli.main(["history-anomalies", "--repo", repo_path, "--run-id", "h2"])
    rep_ok = _json.loads(capsys.readouterr().out)
    assert rc_ok == 0 and rep_ok["n_anomalies"] == 0

    # exactly one history source must be given
    assert cli.main(["history-anomalies", "--repo", repo_path, "--runs", "x"]) == 2
    assert cli.main(["history-anomalies"]) == 2


def test_verdict_diff_classes_and_cli(spark, tmp_path, capsys):
    """Cell-level verdict diff: every change class, no records for
    unchanged cells or new passing cells, and the CLI gate exits 1 only
    when some cell got worse."""
    import json as _json

    from unify_spark import cli
    from unify_spark.plans.audit import AuditLog, verdict_diff

    audit = AuditLog(spark, str(tmp_path / "out" / "audit"))

    def rows(run, cells):
        return [
            {
                "run_id": run,
                "constraint": c,
                "part": p,
                "status": s,
                "violation_count": n,
            }
            for c, p, s, n in cells
        ]

    audit.append(
        rows(
            "A",
            [
                ("c1", "p1", "pass", 0),
                ("c1", "p2", "pass", 0),
                ("c2", "p1", "fail", 5),
                ("c2", "p2", "fail", 3),
                ("c2", "p3", "fail", 9),
                ("c6", "p1", "fail", 2),
                ("c4", "p1", "pass", 0),
            ],
        )
    )
    audit.append(
        rows(
            "B",
            [
                ("c1", "p1", "fail", 2),   # regressed
                ("c1", "p2", "pass", 0),   # unchanged pass -> no record
                ("c2", "p1", "pass", 0),   # fixed
                ("c2", "p2", "fail", 7),   # still_fail, worse
                ("c2", "p3", "fail", 4),   # still_fail, improving
                ("c6", "p1", "fail", 2),   # unchanged count -> no record
                ("c3", "p2", "fail", 1),   # appeared failing
                ("c5", "p1", "pass", 0),   # appeared passing -> no record
            ],
        )
    )

    diff = verdict_diff(audit, "A", "B")
    by = {(d["constraint"], d["part"]): d["change"] for d in diff}
    assert by == {
        ("c1", "p1"): "regressed",
        ("c2", "p1"): "fixed",
        ("c2", "p2"): "still_fail",
        ("c2", "p3"): "still_fail",
        ("c3", "p2"): "appeared",
        ("c4", "p1"): "disappeared",
    }
    reg = next(d for d in diff if d["change"] == "regressed")
    assert (reg["violations_a"], reg["violations_b"]) == (0, 2)

    rc = cli.main(
        ["verdict-diff", "--out", str(tmp_path / "out"), "--from-run", "A",
         "--to-run", "B"]
    )
    rep = _json.loads(capsys.readouterr().out)
    assert rc == 1 and rep["n_worse"] == 3  # regressed + appeared + worse still_fail
    assert rep["by_change"] == {
        "appeared": 1, "disappeared": 1, "fixed": 1, "regressed": 1,
        "still_fail": 2,
    }

    # B -> B: nothing changed, gate passes
    rc0 = cli.main(
        ["verdict-diff", "--out", str(tmp_path / "out"), "--from-run", "B",
         "--to-run", "B"]
    )
    rep0 = _json.loads(capsys.readouterr().out)
    assert rc0 == 0 and rep0["n_changes"] == 0


def test_metrics_repo_retention(spark, tmp_path):
    """prune(keep_last=K) drops the oldest runs file-grain (no rewrite) and
    the envelope window follows; deleting an unknown run is a no-op."""
    repo = MetricsRepository(spark, str(tmp_path / "repo"))
    for i in range(6):
        repo.append([("clips", "*", "dur_ms", "max", str(30000.0 + i))], f"r{i}")
    n_files = len([f for f in os.listdir(repo.path) if f.endswith(".parquet")])
    assert n_files == 6

    dropped = repo.prune(keep_last=3)
    assert dropped == ["r0", "r1", "r2"]
    assert repo.runs() == ["r3", "r4", "r5"]
    assert len([f for f in os.listdir(repo.path) if f.endswith(".parquet")]) == 3

    repo.delete_run("nope")  # unknown run: no-op
    assert repo.runs() == ["r3", "r4", "r5"]

    with pytest.raises(ValueError):
        repo.prune(keep_last=0)

    # prune below min_history leaves repo_anomalies with its no-basis error
    repo.prune(keep_last=1)
    with pytest.raises(ValueError):
        repo_anomalies(repo)


def test_metrics_prune_cli(spark, tmp_path, capsys):
    """CLI twin of prune/delete_run: --keep N keeps the newest N, --run-id
    drops one run, unknown run / both-or-neither flags exit 2."""
    import json

    from unify_spark import cli

    repo = MetricsRepository(spark, str(tmp_path / "repo"))
    for i in range(4):
        repo.append([("clips", "*", "dur_ms", "max", str(30000.0 + i))], f"r{i}")

    assert cli.main(["metrics-prune", "--repo", repo.path, "--keep", "2"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dropped"] == ["r0", "r1"] and out["kept"] == ["r2", "r3"]

    assert cli.main(["metrics-prune", "--repo", repo.path, "--run-id", "r2"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dropped"] == ["r2"] and out["kept"] == ["r3"]

    assert cli.main(["metrics-prune", "--repo", repo.path, "--run-id", "nope"]) == 2
    assert cli.main(["metrics-prune", "--repo", repo.path]) == 2
    assert (
        cli.main(["metrics-prune", "--repo", repo.path, "--keep", "1", "--run-id", "r3"])
        == 2
    )
    capsys.readouterr()


def test_metrics_prune_cli_flag_validation(spark, tmp_path, capsys):
    """--keep 0 and --keep -1 exit 2 with a clean message (not a traceback),
    and --keep 0 is not misread as a missing flag."""
    from unify_spark import cli

    repo = MetricsRepository(spark, str(tmp_path / "repo"))
    repo.append([("clips", "*", "dur_ms", "max", "1.0")], "r0")
    assert cli.main(["metrics-prune", "--repo", repo.path, "--keep", "0"]) == 2
    assert "must be >= 1" in capsys.readouterr().err
    assert cli.main(["metrics-prune", "--repo", repo.path, "--keep", "-1"]) == 2
    capsys.readouterr()
