"""SparkSession construction.

One builder for tests, bench, and the driver contract. Local mode is
used for testing only; every config here is chosen to also be correct
on a large multi-executor cluster (AQE, skew-join handling, Arrow).

Scale notes (100 TB design):
- ``spark.sql.adaptive.enabled``: runtime re-planning (partition
  coalescing, skew-join splitting, dynamic broadcast) is the main
  defence against mis-sized shuffles at scale.
- ``spark.sql.session.timeZone=UTC``: all event-time semantics are
  UTC, matching the reference's ``ZoneOffset.UTC`` parse
  (reference DateParser.java:16) and the DuckDB oracle's naive
  UTC timestamps.
- shuffle partitions default to the local core count; on a real
  cluster this is overridden by the submitter (or left to AQE's
  coalescing with a high initial partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "flink_precisely_demo_spark",
              cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` only affects local mode; on a cluster the master URL is
    taken from the environment / spark-submit and this is ignored.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # streaming replays drain through a parquet FILE sink
        # (streaming/pipeline.replay_to_parquet) — output size never
        # touches the driver, so the default 1g maxResultSize stands
        # (the r11 8g raise is reverted; the tuned session no longer
        # diverges from a plain driver session on result caps)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
