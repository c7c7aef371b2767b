"""Bucketed storage layout: shuffle-free co-located joins and
aggregations (SURVEY §4 point-lookup/latest-version access patterns at
scale).

The reference pays a network round trip per item lookup
(`PodioApiWrapper.py:270-294`) and re-sorts the queue per pop
(`PodioApiGateway.py:190`). At 100 TB the Spark answer is layout, not
indexes: bucket both fact tables by the join/group key at write time,
and every subsequent equi-join or groupBy on that key runs with ZERO
exchange — the single biggest shuffle eliminator for a repeated join
key (item_id / orderkey) in a batch pipeline.

Bucket-count guidance: pick so one bucket of the LARGER table is
~100-200 MB (fits an executor core comfortably); both sides of a
co-located join must use the same count. Bucket pruning applies to
point lookups on the bucket key.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from crm_etl_pipeline_spark import tmpdirs

# external-table root: bucketed data never lands in the session's
# warehouse dir (the driver's own SparkSession may default that to the
# repo cwd) and never in the repo. PID-namespaced so a driver run and a
# pytest run (or two parallel sessions) can't rmtree files the other is
# mid-read — table names are constants, so the root must not be shared.
# Exit-time removal, dead-PID sweep, and the pid-reuse age gate all
# live in tmpdirs (the round-4 fix, generalized to every scratch
# family in the package).
_BUCKET_ROOT = tmpdirs.pid_root("crm_etl_bucketed")


def _drop_table_and_location(spark: SparkSession, name: str) -> None:
    """Idempotent cleanup: the in-memory catalog forgets tables between
    sessions but the table location persists, so a bare saveAsTable
    would fail with LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(f"{_BUCKET_ROOT}/{name.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) EXTERNAL
    table under ``_BUCKET_ROOT``. Sorting within buckets upgrades
    SortMergeJoin to skip its sort."""
    _drop_table_and_location(df.sparkSession, name)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .option("path", f"{_BUCKET_ROOT}/{name.lower()}")
    )
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(name)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Equi-join of two same-bucket-count tables on their bucket keys:
    Catalyst sees both outputs hash-partitioned on the key and plans a
    SortMergeJoin with no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
