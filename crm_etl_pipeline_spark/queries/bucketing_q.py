"""Registered query over the bucketed storage layout (SURVEY §4): the
driver-checked counterpart of tests/test_bucketing.py's zero-exchange
invariants.

The query materializes orders+lineitem bucketed by the order key, then
runs join + groupBy on that key — at scale the layout absorbs BOTH
shuffles (the plan invariant is asserted in pytest; here the oracle
proves the co-located path returns exactly the plain-join answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import bucketing
from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query

_N_BUCKETS = 8


@query(
    "bucketed_join_colocated",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey % 100 = 0
    GROUP BY o_orderkey
    """,
    survey="§4 bucketed layout (co-located join + bucket-key agg, shuffle absorbed by storage)",
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both fact tables bucketed by the order key, then join and
    aggregate on it. With matching bucket counts Catalyst plans a
    SortMergeJoin with NO Exchange on either side and the groupBy reuses
    the same distribution — zero shuffles end-to-end (the invariant
    tests/test_bucketing.py asserts on the plan). The oracle checks the
    co-located path is value-identical to the plain parquet join.

    At 100 TB this layout is the single biggest shuffle eliminator for a
    repeatedly-joined key: pay one bucketed write, then every equi-join
    / groupBy on the key is exchange-free. Bucket count is sized so one
    bucket of the larger table is ~100-200 MB per executor core.
    """
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    bucketing.write_bucketed(orders, "orders_bkt_q", "o_orderkey", _N_BUCKETS)
    bucketing.write_bucketed(li, "lineitem_bkt_q", "l_orderkey", _N_BUCKETS)
    joined = bucketing.co_located_join(
        spark, "lineitem_bkt_q", "orders_bkt_q", "l_orderkey", "o_orderkey"
    )
    return (
        joined.filter(F.col("o_orderkey") % 100 == 0)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.max("o_totalprice").cast("decimal(18,2)").cast("double").alias("o_totalprice"),
        )
    )
