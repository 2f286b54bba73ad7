"""SparkSession factory.

One place to pin the configs the engine depends on:

* Arrow execution on (every UDF in the engine is a pandas/Arrow UDF);
* AQE on (runtime coalescing + skew-join handling — the frontier is
  Zipf-skewed by construction);
* UTC session timezone (all crawl timestamps are warc_ts-anchored; the
  engine never calls wall-clock ``now()`` — reference leaks wall clock
  at dags/utils.py:80-92,128,250 which we deliberately do not).

``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) else 32.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawlspark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = int(cores or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2x cores: enough parallelism for local mode without tiny-task
        # overhead; on a real cluster this is sized to executors*cores*2
        # and AQE coalesces down after shuffles.
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("CRAWLSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
