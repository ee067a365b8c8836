"""Constraint suggestion (plans/suggest.py): profile → suggest → validate.
Suggestions describe the data as-is (round-trip passes on the data they
were derived from) and catch regressions when run against mutated data."""

import os

import pytest

from unify_spark.fixtures import generate_fixture
from unify_spark.plans import ValidationRunner, load_audio_tables
from unify_spark.plans.config import _build_constraint
from unify_spark.plans.suggest import suggest_constraints
from unify_spark.operators.base import ValidationContext


@pytest.fixture(scope="module")
def clean_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clean_fixture"))
    generate_fixture(d, n_rows=2000, n_parts=4, inject=False)
    return d


@pytest.fixture(scope="module")
def clean_tables(spark, clean_dir):
    return load_audio_tables(spark, clean_dir)


@pytest.fixture(scope="module")
def suggested(clean_tables):
    return suggest_constraints(clean_tables, exclude={"clips": ["bytes"]})


def _by_type(sug, t):
    return [s for s in sug["constraints"] if s["type"] == t]


def test_suggests_expected_families(suggested, clean_tables):
    uniq = _by_type(suggested, "uniqueness")
    assert {"type": "uniqueness", "table": "clips", "keys": ["clip_id"]} in uniq
    assert all(
        suggested["evidence"][f"uniqueness:{s['table']}.{s['keys'][0]}"][
            "verified_exact"
        ]
        for s in uniq
    )

    doms = {(s["table"], s["column"]): s for s in _by_type(suggested, "domain")}
    codec_dom = doms[("clips", "codec")]
    allowed = {
        r[0] for r in clean_tables["codec_domain"].select("codec").collect()
    }
    assert set(codec_dom["allowed"]) <= allowed and codec_dom["allowed"]

    rngs = {(s["table"], s["column"]): s for s in _by_type(suggested, "range")}
    sr = rngs[("clips", "sr_hz")]
    assert "allowed_set" in sr and len(sr["allowed_set"]) <= 10  # enum-like rates
    dur = rngs[("clips", "dur_ms")]
    assert ("min" in dur and "max" in dur) or "allowed_set" in dur

    cds = {(s["table"], s["column"]): s for s in _by_type(suggested, "categorical_drift")}
    cd = cds[("clips", "codec")]
    assert cd["categories"] == codec_dom["allowed"]  # verified domain reused
    ev = suggested["evidence"]["cat_drift:clips.codec"]
    assert ev["from"] == "verified domain"
    # the clean fixture's codec mix genuinely varies by partition (mp3-days
    # vs ulaw-days), so the suggestion must arrive CALIBRATED above the
    # observed baseline PSI — the suggested suite passes its own data
    assert ev["calibrated"] and cd["psi_threshold"] >= 1.2 * ev["baseline_max_psi"]
    # dim tables without the part column get no drift companion
    assert ("codec_domain", "codec") not in cds

    drs = {(s["table"], s["column"]): s for s in _by_type(suggested, "drift")}
    ddur = drs[("clips", "dur_ms")]
    assert ddur["bounds"][0] < ddur["bounds"][1]  # stable bins from observed range
    # id-like columns never get a drift companion (a monotone id's
    # per-partition distribution always "drifts")
    assert ("transcript_map", "row_index") not in drs
    assert ("clips", "clip_id") not in drs

    reqs = {s["table"]: s for s in _by_type(suggested, "required")}
    assert "clip_id" in reqs["clips"]["columns"]

    refs = {
        (s["child_table"], s["child_key"], s["parent_table"])
        for s in _by_type(suggested, "referential")
    }
    assert ("transcript_map", "clip_id", "clips") in refs
    assert ("clips", "codec", "codec_domain") in refs  # dim-table integrity


def test_roundtrip_clean_data_passes(spark, clean_tables, suggested, tmp_path):
    suite = [_build_constraint(s) for s in suggested["constraints"]]
    runner = ValidationRunner(
        spark, str(tmp_path), ValidationContext(run_id="rt", payload_cap_ms=50)
    )
    res = runner.run_fused(clean_tables, suite, resume=False)
    assert res.passed, res.violation_counts


def test_suggested_suite_catches_regressions(spark, audio_tables, suggested, tmp_path):
    """The dirty session fixture is the clean fixture + injected defects:
    the clean-derived suggestions must flag them."""
    suite = [_build_constraint(s) for s in suggested["constraints"]]
    runner = ValidationRunner(
        spark, str(tmp_path), ValidationContext(run_id="dirty", payload_cap_ms=50)
    )
    res = runner.run_fused(audio_tables, suite, resume=False)
    assert not res.passed
    assert res.violation_counts.get("uniqueness:clips.clip_id", 0) > 0
    assert res.violation_counts.get("domain:clips.codec", 0) > 0
    assert res.violation_counts.get("range:clips.sr_hz", 0) > 0


def test_cli_suggest_then_validate(clean_dir, tmp_path, capsys):
    import json as _json

    from unify_spark import cli
    from unify_spark.plans.config import load_suite_config

    tables_args = [
        f"clips={os.path.join(clean_dir, 'clips')}",
        f"transcript_map={os.path.join(clean_dir, 'transcript_map.parquet')}",
        f"codec_domain={os.path.join(clean_dir, 'codec_domain.parquet')}",
    ]
    suite_path = str(tmp_path / "suggested.yaml")
    rc = cli.main(
        ["suggest-constraints", "--tables", *tables_args, "--out", suite_path,
         "--exclude", "clips=bytes"]
    )
    out = capsys.readouterr().out
    rep = _json.loads(out[out.index("{"):])
    assert rc == 0 and rep["n_suggestions"] > 0 and rep["by_type"]["uniqueness"] >= 1
    assert os.path.exists(suite_path)
    cfg = load_suite_config(suite_path)  # parses through the real loader
    assert cfg.tables["clips"] == os.path.abspath(os.path.join(clean_dir, "clips"))

    rc2 = cli.main(
        ["validate", "--config", suite_path, "--out", str(tmp_path / "v"),
         "--run-id", "sv", "--fused"]
    )
    out2 = capsys.readouterr().out
    rep2 = _json.loads(out2[out2.index("{"):])
    assert rc2 == 0 and rep2["passed"]
