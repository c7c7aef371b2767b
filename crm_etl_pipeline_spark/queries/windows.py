"""Window / ordering / top-k operators (SURVEY §2.4 L1–L2 and the
"latest version" access pattern behind SCD2, §2.4 L3).

The reference's FIFO pop is `find_one(sort=[('timestamp', ASC)])`
(`PodioApiGateway.py:190`) and its latest-version lookup is
`find_one(sort=[('timestamp', -1)])` (`PodioApiGateway.py:165`);
both generalize to window functions partitioned by key. Every
orderBy here has a unique tiebreaker so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query


@query(
    "latest_order_per_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t JOIN customer ON o_custkey = c_custkey
    WHERE rn = 1
    """,
    survey="L2 (latest-version lookup; PodioApiGateway.py:165)",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest row per key — the 'current version' access pattern."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    cust = table(spark, sf_dir, "customer")
    return latest.join(cust, latest.o_custkey == cust.c_custkey).select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
    )


@query(
    "running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    """,
    survey="window running agg (versioned-history roll-forward)",
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running total in order-date order; DECIMAL
    accumulation keeps the prefix sums cross-engine exact."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rnk FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk
      FROM part
    ) t WHERE rnk <= 3
    """,
    survey="top-k per group (window rank)",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand via dense_rank (ties all kept, so
    the result is deterministic without a tiebreaker)."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        table(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
        .withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "lag_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           DATE_DIFF('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev
    FROM orders
    """,
    survey="lag/lead (sessionization building block)",
)
def lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag + datediff)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )
