"""SparkSession construction with scale-appropriate defaults.

The reference hardcodes ``spark.sql.shuffle.partitions=1`` (its
usage.ipynb cell 1 / test_predid.py:17), which serializes every
shuffle. We instead enable AQE so Spark picks shuffle parallelism and
handles skew at runtime — the setting that actually survives a
1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "csdid-pyspark-engine",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for local testing.

    On a real cluster the master/memory settings come from
    spark-submit; everything set here is cluster-safe (AQE, Arrow,
    UTC session timezone).
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "32")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS") or "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing normally does NOT apply inside persisted
        # plans (default false), so a small cached aggregate freezes at
        # the full shuffle-partition count and every downstream pass
        # pays task launch per near-empty partition (the cache.py
        # frozen-partitioning trap, measured: events_stickiness 57 ->
        # 216 tasks after adding a persist). Letting AQE size cached
        # output is scale-adaptive in both directions: tiny cached
        # frames coalesce, data-scale ones keep their width via the
        # same advisory-bytes rule as any shuffle.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
