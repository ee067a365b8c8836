"""Sampled payload validation: the decode-heavy per-row check runs on a
deterministic hash-sample and the runner extrapolates the violation rate
with a Wilson interval — the Deequ-style approximate-check analogue for
10^12-row tables where exhaustive decode dominates suite cost."""

import pytest
from pyspark.sql import functions as F

from unify_spark.functions.sampling import wilson_interval
from unify_spark.operators.base import ValidationContext
from unify_spark.operators.payload import AudioPayloadConstraint
from unify_spark.plans import ValidationRunner, audio_suite
from unify_spark.plans.config import _build_constraint


def test_wilson_interval_math():
    # degenerate and boundary regimes first — where a normal approx breaks
    assert wilson_interval(0, 0) == (0.0, 1.0)
    lo, hi = wilson_interval(0, 100)
    assert lo < 1e-12 and 0.03 < hi < 0.045  # z^2/(n+z^2) ~ 0.037
    lo, hi = wilson_interval(100, 100)
    assert hi > 1 - 1e-12 and 0.955 < lo < 0.97
    lo, hi = wilson_interval(50, 100)
    assert 0.40 < lo < 0.41 and 0.59 < hi < 0.60
    assert 0.0 <= lo <= hi <= 1.0
    with pytest.raises(ValueError):
        wilson_interval(5, 4)


def test_sample_rate_validation():
    with pytest.raises(ValueError):
        AudioPayloadConstraint(sample_rate=0.0)
    with pytest.raises(ValueError):
        AudioPayloadConstraint(sample_rate=1.5)
    assert not AudioPayloadConstraint(sample_rate=1.0).is_sampled
    assert not AudioPayloadConstraint().is_sampled
    assert AudioPayloadConstraint(sample_rate=0.25).is_sampled


def test_null_key_rows_always_kept(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "clip_id string"
    )
    c = AudioPayloadConstraint(sample_rate=1e-9)
    kept = df.where(c._keep()).select("clip_id").collect()
    # the NULL row survives even a vanishing rate — a row the sampler cannot
    # address must never be silently skipped
    assert None in {r["clip_id"] for r in kept}


def _payload_keys(df):
    return {
        r["key"]
        for r in df.filter(F.col("constraint").startswith("payload:"))
        .select("key")
        .distinct()
        .collect()
    }


def test_sampled_violations_subset_and_deterministic(audio_tables, manifest):
    ctx = ValidationContext(run_id="s", payload_cap_ms=manifest["payload_cap_ms"])
    full = AudioPayloadConstraint("clips", "reference_decode")
    samp = AudioPayloadConstraint("clips", "reference_decode", sample_rate=0.5)
    full_keys = _payload_keys(full.violations(audio_tables, ctx))
    k1 = _payload_keys(samp.violations(audio_tables, ctx))
    k2 = _payload_keys(samp.violations(audio_tables, ctx))
    assert k1 == k2  # hash sampling: same clips re-decode on every run
    assert k1 <= full_keys
    assert full_keys == set(manifest["payload_clip_ids"])


def test_sampling_estimates_end_to_end(spark, audio_tables, manifest, tmp_path):
    suite = [
        AudioPayloadConstraint(
            "clips", "reference_decode",
            null_bytes_constraint="required:clips.bytes",
            sample_rate=0.5,
        )
    ]
    ctx = ValidationContext(run_id="est", payload_cap_ms=manifest["payload_cap_ms"])
    runner = ValidationRunner(spark, str(tmp_path), ctx)
    res = runner.run_fused(audio_tables, suite, resume=False)
    est = runner.sampling_estimates(audio_tables, suite, res)
    assert set(est) == {"payload:clips.bytes", "required:clips.bytes"}
    e = est["payload:clips.bytes"]
    n_total = audio_tables["clips"].count()
    assert e["total_rows"] == n_total
    # hash sample of rate .5: binomial around n/2, generous 3-sigma-ish band
    assert 0.45 * n_total < e["sampled_rows"] < 0.55 * n_total
    assert e["sampled_violations"] == res.violation_counts.get(
        "payload:clips.bytes", 0
    )
    # the Wilson band on the TOTAL count must bracket the true (exhaustive)
    # violation count — the whole point of the estimate
    true_k = len(manifest["payload_clip_ids"])
    lo, hi = e["wilson95_total"]
    assert lo <= true_k <= hi
    lo_r, hi_r = e["wilson95_rate"]
    assert 0.0 <= lo_r <= hi_r <= 1.0
    # the piggybacked null-bytes emission is extrapolated too (fixture V6:
    # 3 of the 7 injected nulls are bytes-nulls — same pin as the golden test)
    nb = est["required:clips.bytes"]
    assert nb["wilson95_total"][0] <= 3 <= nb["wilson95_total"][1]


def test_suite_and_config_factory_thread_sample_rate():
    s = audio_suite(payload_sample_rate=0.25)
    pay = [c for c in s if isinstance(c, AudioPayloadConstraint)]
    assert len(pay) == 1 and pay[0].sample_rate == 0.25 and pay[0].is_sampled
    c = _build_constraint(
        {"type": "payload", "table": "clips", "sample_rate": "0.1", "sample_salt": "x"}
    )
    assert c.is_sampled and c.sample_rate == 0.1 and c.sample_salt == "x"
    assert not _build_constraint({"type": "payload"}).is_sampled


def test_cli_payload_sample_rate(fixture_dir, tmp_path, capsys):
    import json as _json
    import os as _os

    from unify_spark import cli

    rc = cli.main(
        ["validate", "--tables",
         f"clips={_os.path.join(fixture_dir, 'clips')}",
         f"transcript_map={_os.path.join(fixture_dir, 'transcript_map.parquet')}",
         f"codec_domain={_os.path.join(fixture_dir, 'codec_domain.parquet')}",
         f"reference_decode={_os.path.join(fixture_dir, 'reference_decode.parquet')}",
         "--out", str(tmp_path / "out"), "--run-id", "rs", "--fused",
         "--payload-sample-rate", "0.5"]
    )
    out = capsys.readouterr().out
    rep = _json.loads(out[out.index("{"):])
    assert rc == 1  # other (exhaustive) constraints still fail the fixture
    est = rep["sampled_estimates"]["payload:clips.bytes"]
    assert est["sample_rate"] == 0.5
    assert est["wilson95_total"][0] <= est["estimated_total_violations"]


def test_sample_filter_sits_below_arrow_boundary(audio_tables, manifest):
    """The md5 keep-filter must evaluate BEFORE rows cross into the
    mapInPandas decode — non-sampled rows never pay Arrow serialization.
    In the executed-plan string (printed root-first) the Python decode node
    must appear ABOVE the md5 filter."""
    ctx = ValidationContext(run_id="pp", payload_cap_ms=manifest["payload_cap_ms"])
    c = AudioPayloadConstraint("clips", "reference_decode", sample_rate=0.25)
    vio = c.violations(audio_tables, ctx)
    plan = vio._jdf.queryExecution().executedPlan().toString()
    i_py = plan.find("MapInPandas")
    i_md5 = plan.find("md5(")
    assert i_py != -1 and i_md5 != -1
    assert i_py < i_md5  # decode node above (= after) the sample filter
