"""Storage layout primitives for scan efficiency at 100 TB.

The reference loads everything into MongoDB collections and scans them
whole (`PodioApiGateway.py:111-137`); at warehouse scale the layout IS
the index. Two primitives:

- **Directory partitioning** (`write_date_partitioned`): one
  directory per day. A literal date predicate never touches the other
  days' files — Catalyst resolves it against the partition index at
  plan time (`PartitionFilters` in the scan node), so a one-day query
  on a 10-year corpus lists ~0.03 % of the files. A join against a
  filtered dimension on the partition column upgrades to dynamic
  partition pruning at runtime.
- **Range-sorted files** (`write_range_sorted`): global range
  partitioning + in-file sort gives every parquet file a disjoint
  min/max envelope on the sort key, so row-group statistics skip
  whole files for selective range predicates — the poor man's
  clustered index, and the layout a time-series fact table should
  ship with.

Both are one shuffle at write time, amortized over every later read.
tests/test_layout.py asserts the pruning is real (plan inspection) and
the envelopes are disjoint (parquet footer statistics), not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Write one directory per event date. The repartition on the
    derived date keys co-locates each day before the write so a day's
    rows land in O(1) files instead of one file per upstream task —
    at 1000 executors the difference between 365 and 365 000 files a
    year."""
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition(F.col("event_date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Literal one-day read — prunes statically to a single partition
    directory (PartitionFilters, verified in tests/test_layout.py)."""
    return spark.read.parquet(path).filter(F.col("event_date") == F.lit(day))


def write_range_sorted(df: DataFrame, path: str, col: str, n_files: int) -> None:
    """Range-partition globally on `col`, sort within each partition,
    write — every output file covers a disjoint key range (footer
    min/max verified in tests), enabling file- and row-group-level
    skipping for range predicates on `col`."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zvalue(a, b):
    """Morton (Z-order) interleave of two 16-bit bucket ranks into one
    32-bit curve position — pure integer column algebra (shift/AND/OR
    magic-number bit spreading), identical arithmetic in any engine,
    so a DuckDB oracle can recompute it bit-exactly.

    Sorting files by z-value bounds EVERY file's min/max envelope on
    BOTH dimensions at once (a linear sort bounds only its own key):
    a 2-D range predicate then skips files via ordinary parquet footer
    statistics on the two raw columns — multi-dimensional clustering
    with zero new machinery at read time. The curve is the layout the
    big table formats call Z-ORDER; here it is ~10 Catalyst expressions.
    """
    def spread(x):
        # 16 bits → even bit positions of a 32-bit lane
        x = x.bitwiseAND(F.lit(0xFFFF))
        x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
        x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
        x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
        x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
        return x

    return spread(a.cast("bigint")).bitwiseOR(
        F.shiftleft(spread(b.cast("bigint")), 1)
    )


def write_zordered(df: DataFrame, path: str, zcol: str, n_files: int) -> None:
    """Range-partition globally on the precomputed z-value column and
    sort within each file — every output file covers a disjoint curve
    segment, hence a bounded box in BOTH original dimensions (footer
    envelopes asserted in tests/test_layout.py). One shuffle at write
    time, same cost shape as write_range_sorted."""
    (
        df.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def regrain_month(spark: SparkSession, day_path: str, month_path: str) -> None:
    """Partition evolution: re-grain a day-partitioned store to month
    directories. A store laid out for day-grain queries accumulates
    365 directories a year; once a year ages into cold history, month
    grain serves the same scans from 12× fewer directories (and 12×
    fewer, 12× larger files after the regrain repartition — the same
    small-file argument as compaction, at directory level).

    One shuffle on the new grain, zero row changes — the re-grain must
    be invisible to every reader except through the partition column
    (proven by the unchanged-results-hash oracle of
    ``partition_evolution_regrain``). At 100 TB this runs on COLD
    partitions only: new writes land at the new grain while historical
    days re-grain month by month, each month an independent job — the
    store never locks, and a WAP-style staging flip publishes each
    re-grained month atomically."""
    df = spark.read.parquet(day_path)
    (
        df.withColumn("event_month", F.trunc(F.col("event_date"), "month"))
        .drop("event_date")
        .repartition(F.col("event_month"))
        .write.mode("overwrite")
        .partitionBy("event_month")
        .parquet(month_path)
    )
