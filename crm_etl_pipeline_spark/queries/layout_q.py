"""Storage-layout queries: scan efficiency from the file layout itself
(crm_etl_pipeline_spark.layout). The registered query proves the
date-partitioned store serves day-grain questions from one partition
directory; the static-pruning and disjoint-envelope assertions live in
tests/test_layout.py (plan + parquet-footer inspection).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import layout, tmpdirs
from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query


def _workdir(tag: str, sf_dir: str) -> str:
    """Fresh per-invocation scratch dir, exit-removed and crash-swept
    by tmpdirs."""
    return tmpdirs.pid_scoped(
        "crm_etl_layout", tag, os.path.basename(sf_dir.rstrip("/"))
    )


@query(
    "partition_pruned_scan",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
    FROM events
    WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) FROM events)
    GROUP BY event_type
    """,
    survey="S1,F1 at layout level (date-partitioned store; partition-pruned day scan)",
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lay the events table out one-directory-per-day, then answer a
    one-day question against the partitioned store. The day filter
    arrives as a broadcast equi-join on the partition column (the
    dynamic-partition-pruning shape — a literal predicate would prune
    statically, tests/test_layout.py shows both), so at 100 TB the scan
    lists one day's directory, not the decade. The aggregate
    accumulates value in DECIMAL so the oracle hash matches
    bit-for-bit regardless of per-partition summation order."""
    path = os.path.join(_workdir("pruned", sf_dir), "events_by_day")
    layout.write_date_partitioned(table(spark, sf_dir, "events"), path)
    store = spark.read.parquet(path)
    first_day = store.agg(F.min("event_date").alias("event_date"))
    return (
        store.join(F.broadcast(first_day), "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("day_value"),
        )
    )
