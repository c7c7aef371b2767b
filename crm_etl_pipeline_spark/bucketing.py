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

import atexit
import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

# external-table root: bucketed data never lands in the session's
# warehouse dir (the driver's own SparkSession may default that to the
# repo cwd) and never in the repo. PID-namespaced so a driver run and a
# pytest run (or two parallel sessions) can't rmtree files the other is
# mid-read — table names are constants, so the root must not be shared.
# The per-PID root is removed at process exit, and roots left by dead
# PIDs (crashed runs never reach atexit) are swept at import, so
# repeated runs don't accumulate bucketed table data in /tmp.
_BUCKET_ROOT = f"{tempfile.gettempdir()}/crm_etl_bucketed_{os.getpid()}"

atexit.register(shutil.rmtree, _BUCKET_ROOT, ignore_errors=True)


# age gate for the sweep: a root whose owning pid number is now an
# unrelated long-lived process (pid reuse) would look "alive" to the
# kill(0) probe forever; no legitimate run keeps a bucket root around
# this long, so age alone is sufficient cause to reclaim.
_STALE_ROOT_AGE_S = 6 * 3600


def _sweep_stale_roots() -> None:
    import time

    now = time.time()
    for p in glob.glob(f"{tempfile.gettempdir()}/crm_etl_bucketed_*"):
        try:
            pid = int(p.rsplit("_", 1)[-1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            if now - os.path.getmtime(p) > _STALE_ROOT_AGE_S:
                shutil.rmtree(p, ignore_errors=True)  # pid-reuse-proof reclaim
                continue
        except OSError:
            continue  # raced with another sweeper
        try:
            os.kill(pid, 0)  # liveness probe only
        except ProcessLookupError:
            shutil.rmtree(p, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave its root alone


_sweep_stale_roots()


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
