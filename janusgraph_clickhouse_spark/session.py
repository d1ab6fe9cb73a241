"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); the config here is nevertheless chosen to survive a
1000-executor cluster at ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join selection) —
  the reference has no optimizer at all (SURVEY §4), we lean on Catalyst.
- Arrow on for the pandas-UDF paths (LLM ops) so Python crossings are
  columnar batches, never per-row pickling.
- Shuffle partitions sized for the local harness; on a real cluster AQE
  coalesces from a deliberately high initial number, so we set the initial
  partition count high and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "janusgraph-clickhouse-spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally provided session.

    The correctness driver hands us its own SparkSession; only
    runtime-mutable confs may be touched here (session timezone matters for
    timestamp comparisons against the DuckDB oracle).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; fine either way
    return spark
