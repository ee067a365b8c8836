"""Structured Streaming validation: file stream of clips metadata →
row-local violation column, and foreachBatch full-suite runs."""

import os

import pytest
from pyspark.sql import functions as F

from unify_spark.operators.base import ValidationContext
from unify_spark.plans.suite import audio_suite
from unify_spark.streaming import validate_stream, validate_stream_foreach_batch


@pytest.fixture(scope="module")
def stream_source(spark, fixture_dir, tmp_path_factory):
    # stream over the clips metadata (drop bytes to keep the stream light)
    out = str(tmp_path_factory.mktemp("stream_src"))
    spark.read.parquet(os.path.join(fixture_dir, "clips")).drop("bytes").coalesce(
        4
    ).write.mode("overwrite").parquet(out)
    return out


def test_row_level_stream(spark, stream_source, manifest, tmp_path):
    from unify_spark.fixtures.generate import DUR_MAX_MS, SR_CHOICES
    from unify_spark.operators.constraints import (
        DomainConstraint,
        RangeConstraint,
        RequiredConstraint,
    )

    schema = spark.read.parquet(stream_source).schema
    stream = spark.readStream.schema(schema).parquet(stream_source)
    assert stream.isStreaming
    # the byte-less metadata stream can check everything except bytes
    row_local = [
        DomainConstraint("clips", "codec", allowed=["pcm_s16le", "flac", "ulaw", "mp3"]),
        RangeConstraint("clips", "sr_hz", allowed_set=list(SR_CHOICES)),
        RangeConstraint("clips", "dur_ms", min_value=0, max_value=DUR_MAX_MS, min_exclusive=True),
        RequiredConstraint("clips", ["transcript"]),
    ]
    validated = validate_stream(stream, row_local)
    sink = str(tmp_path / "sink")
    q = (
        validated.filter(F.size("violations") > 0)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    keys = {r["clip_id"] for r in got.select("clip_id").collect()}
    expected = (
        set(manifest["codec_domain_clip_ids"])
        | set(manifest["range_clip_ids"])
        | set(manifest["nullness_clip_ids"])
    )
    # null-bytes rows can't be flagged on a byte-less stream; everything else must be
    expected_stream = expected - set(manifest["nullness_clip_ids"][4:])
    assert keys == expected_stream


def test_foreach_batch_suite(spark, fixture_dir, stream_source, manifest, tmp_path):
    from unify_spark.operators.constraints import DomainConstraint, RangeConstraint

    schema = spark.read.parquet(stream_source).schema
    stream = spark.readStream.schema(schema).parquet(stream_source)
    constraints = [
        DomainConstraint("clips", "codec", allowed=["pcm_s16le", "flac", "ulaw", "mp3"]),
        RangeConstraint("clips", "dur_ms", min_value=0, max_value=30000, min_exclusive=True),
    ]
    out = str(tmp_path / "runs")
    q = validate_stream_foreach_batch(
        stream,
        constraints,
        tables={},
        stream_table_name="clips",
        out_dir=out,
        ctx=ValidationContext(run_id="stream-run"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(180)
    audit = spark.read.parquet(os.path.join(out, "audit"))
    done = audit.filter(
        (F.col("status") == "done") & F.col("run_id").startswith("stream-run@")
    )
    rows = done.groupBy("constraint").agg(F.sum("violation_count").alias("n")).collect()
    counts = {r["constraint"]: r["n"] for r in rows}
    assert counts["domain:clips.codec"] == len(manifest["codec_domain_clip_ids"])
    # dur violations only (4 of the 9 range rows are dur, 5 are sr)
    assert counts["range:clips.dur_ms"] == 4
