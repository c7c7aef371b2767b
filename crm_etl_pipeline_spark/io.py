"""Source layer: parquet table readers for the fixture star schema.

Reference parity: the reference's scans are paginated REST extractions
with server-side filter/limit pushdown (`PodioApiWrapper.py:104-167`).
Here a scan is a declarative ``spark.read.parquet`` — Catalyst pushes
filters to the parquet row-group level and prunes columns, and file
splits replace the manual offset loop with partition parallelism, so
at 100 TB the same one-liner becomes a 1000-way parallel scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (S1 family: filter/limit/projection pushdown
    happen automatically once callers chain .filter/.select).

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; we read nanos as long and convert to a microsecond
    timestamp with integer arithmetic (no double round-trip — ns since
    epoch exceeds double's 53-bit mantissa). DuckDB truncates ns→µs the
    same way, so oracle comparisons agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # nanosAsLong is set at session build (session.py); sessions built
        # elsewhere (e.g. the driver's) get a one-time guarded set here —
        # it is a session-wide legacy conf with no per-read equivalent.
        # DuckDB truncates ns→µs the same way (the fixture's sub-µs
        # component is zero), so oracles agree.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
