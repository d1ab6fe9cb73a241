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
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; fine either way
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Ship this package to the Python workers via addPyFile.

    Pandas-UDF / mapInPandas closures reference functions in this package;
    workers unpickle them by importing the module, so the package must be
    on every worker's sys.path.  Driver-side sys.path edits don't
    propagate (workers are separate processes — on a real cluster,
    separate machines), so we zip the package once per session and
    `sc.addPyFile` it: the standard way to ship Python deps with a job.
    """
    flag = "spark.jcs.package.shipped"
    try:
        if spark.conf.get(flag, "") == "true":
            return
    except Exception:
        pass
    import shutil
    import tempfile

    import janusgraph_clickhouse_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    staging = tempfile.mkdtemp(prefix="jcs_pyfiles_")
    zip_base = os.path.join(staging, "janusgraph_clickhouse_spark")
    zip_path = shutil.make_archive(
        zip_base, "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set(flag, "true")
