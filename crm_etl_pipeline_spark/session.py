"""SparkSession factory tuned for the test/bench environment.

Local mode is a correctness/bench harness only; every config here is
chosen to also be sane on a large cluster (AQE on, adaptive skew join,
Arrow for the Pandas-UDF slow path). ``spark.sql.session.timeZone`` is
pinned to UTC so timestamp values hash identically to the DuckDB
oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "crm_etl_pipeline_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned local SparkSession.

    On a real cluster the master/memory settings come from spark-submit;
    everything under ``spark.sql.*`` below is cluster-appropriate as-is.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions ~ cores for local; AQE coalesces at runtime anyway
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); read nanos as long once,
        # globally, instead of mutating session conf inside readers
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed tables (bucketing.py) land here, never in the repo cwd
        .config("spark.sql.warehouse.dir", "/tmp/crm_etl_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
