"""SparkSession construction with scale-oriented defaults.

Single place where we encode the cluster-tuning stance of the engine:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for all pandas UDF exchange, explicit shuffle parallelism. On a real
multi-executor cluster the same settings apply; only ``master`` changes
(spark-submit provides it), so ``get_spark(master=None)`` defers to the
environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[N], 128 GiB). On a 1000-executor
# cluster the shuffle partition count is governed by AQE coalescing from
# ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` instead, and
# file-split sizing by maxPartitionBytes — both safe to keep here.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # NOTE on shuffled-hash joins, tried and rejected in round 6 (guide
    # §3.1): the static preference (preferSortMergeJoin=false) decides from
    # SIZE ESTIMATES and OOM'd a 4M-row build side at local[2]; the
    # runtime-sized AQE form (maxShuffledHashJoinLocalMapThreshold=64m)
    # still died at local[32], where 32 concurrent tasks share the
    # execution pool and a per-partition build that "fits" alone does not
    # fit 32-wide ("not enough memory to build hash map"). Neither
    # measured a win beyond noise once the explicit per-operator
    # SHUFFLE_HASH hints (whose builds are provably slim) were in place,
    # so fact×fact joins stay sort-merge.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # keep Arrow batches a few MB when wide binary columns cross the JVM→
    # Python boundary: 10k-row batches of ~2.4 KB payloads measured 4-15x
    # SLOWER at 32 concurrent workers (allocation pressure); 2048 keeps
    # per-batch buffers ~5 MB. A 2048/4096/8192 sweep on the ISOLATED
    # payload stage at 8 workers favored 4096 (27.7/22.4/24.3s), but the
    # win inverts when the fused suite runs other stages concurrently
    # (4N suite throughput dropped ~7% at 4096), so the default stays 2048.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.sql.files.maxPartitionBytes": "128m",
    # partition-grain count/min/max aggregates (the runner's table_stats
    # pre-pass, partition-completeness checks) answer from parquet
    # footer/row-group metadata instead of scanning data columns —
    # measured 2.9s → 0.8s for groupBy(part).count() over the 4M-clip
    # fixture, a level-invariant saving in every suite run (guide §6);
    # results are exact (Spark only pushes when semantics allow)
    "spark.sql.parquet.aggregatePushDown": "true",
    # fixture tables are hive-partitioned by part_date=YYYY-MM-DD; keep the
    # partition value a string (matches the declared schema) instead of date
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "unify_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master=None`` leaves master to spark-submit / environment; tests and
    bench pass ``local[8]`` / ``local[32]`` explicitly. ``shuffle_partitions``
    defaults to the local core count so one-stage shuffles saturate the
    machine without tiny-partition overhead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # match the advertised parallelism of the master string when local
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = int(master[6:-1])
        else:
            shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf["spark.default.parallelism"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Fully stop the active session so a new master can be used (bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Spark 4 keeps a default-session holder; clear it so the next
    # ``getOrCreate`` builds a fresh context with the requested master.
    try:  # pragma: no cover - defensive, API is stable in practice
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
    except Exception:
        pass
