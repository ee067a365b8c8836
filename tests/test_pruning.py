"""Physical-plan guarantees: partition pruning and filter pushdown on the
fixture layout (hive-partitioned parquet; Iceberg manifests at production)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_partition_pruning(spark, audio_tables):
    df = audio_tables["clips"].filter(F.col("part_date") == "2025-01-03")
    plan = _plan(df.select("clip_id"))
    assert "PartitionFilters: [isnotnull(part_date" in plan
    # pruned scan must not read other partitions: count matches a full scan filter
    full = audio_tables["clips"].groupBy("part_date").count().collect()
    expected = {r["part_date"]: r["count"] for r in full}["2025-01-03"]
    assert df.count() == expected


def test_filter_pushdown_and_pruning(spark, audio_tables):
    df = audio_tables["clips"].filter(F.col("sr_hz") == 16000).select("clip_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(sr_hz), EqualTo(sr_hz,16000)]" in plan
    # column pruning: bytes/transcript never read
    assert "ReadSchema: struct<clip_id:string,sr_hz:int>" in plan
