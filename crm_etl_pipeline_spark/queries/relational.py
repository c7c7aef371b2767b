"""Relational core queries (SURVEY.md §2.1 scans, §2.3 filters, §2.5
joins, §2.6 aggregations, §2.4 ordering/top-k).

The reference's scans are REST pagination loops with server-side filter
pushdown (`PodioApiWrapper.py:104-167`); here every scan is a parquet
read whose filters/projections Catalyst pushes to the row-group level.
Joins the reference's data model implies (`app`-type FK fields,
`PodioApiWrapper.py:68-69`) map to equi-joins; the tiny dimensions
(nation/region — catalog analogs) broadcast.

Cross-engine determinism: money aggregates accumulate in DECIMAL and
cast to double at the end (see registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query

# l_extendedprice ~ 1e5 max; decimal(18,2) holds row values; Spark widens
# sums automatically. Both engines compute the per-row product in double
# (deterministic per-row), cast to decimal (exact), then sum exactly.
_DISC_PRICE_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))"
_CHARGE_DEC = "CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))"


def _disc_price_dec() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")


def _charge_dec() -> F.Column:
    return (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(28,6)")


@query(
    "flagship_segment_revenue",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           COUNT(*) AS n_lineitems
    FROM (SELECT c_custkey, MIN(c_mktsegment) AS c_mktsegment
          FROM customer GROUP BY c_custkey) c
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_mktsegment
    """,
    survey="S1,F1,J1,A3,L-ordering (flagship; SURVEY §7 milestone 0)",
)
def flagship_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current revenue per customer market segment.

    lineitem is pre-aggregated to order grain FIRST (one narrow
    map-side-combined shuffle on l_orderkey), so (a) the joins carry one
    row per order instead of every lineitem and (b) n_orders is a plain
    count — no countDistinct Expand pass over the fact table. customer
    is fact-scaled (150k × SF — tens of GB at the 100 TB design point),
    so no forced broadcast: AQE picks broadcast at small SF and demotes
    to shuffle join at scale.

    The customer dim is identity-grain (round-10 id_collision_customer
    probe): a collided c_custkey carrying two different rows would fan
    the join out, silently double-attributing orders — and the plain
    count would diverge from the oracle's COUNT(DISTINCT). One
    deterministic winner per custkey (MIN segment, map-side
    combinable — no countDistinct Expand re-introduced) keeps the
    order-grain design valid under collision; no-op when keys are
    unique.
    """
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy("c_custkey")
        .agg(F.min("c_mktsegment").alias("c_mktsegment"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_order = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", _disc_price_dec().alias("disc_price"))
        .groupBy("l_orderkey")
        .agg(
            F.sum("disc_price").alias("order_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("order_revenue").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_lines").alias("n_lineitems"),
        )
    )


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_DISC_PRICE_DEC}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_CHARGE_DEC}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A-family,F1 (TPC-H Q1 shape)",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one scan, map-side partial aggs,
    8 aggregates over 2 group keys. Whole plan stays in codegen."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
        F.sum(_disc_price_dec()).cast("double").alias("sum_disc_price"),
        F.sum(_charge_dec()).cast("double").alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / cnt).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "point_lookup",
    oracle="SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer WHERE c_custkey = 42",
    survey="S2 (point lookup by key; PodioApiWrapper.py:270-294)",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch one item by key — partition/file pruning on the key column."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@query(
    "filtered_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
      AND l_quantity >= 45
    """,
    survey="S1,F1 (filtered app scan w/ pushdown; PodioApiWrapper.py:104-167)",
)
def filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Server-side-filter analog: predicate + projection pushed to parquet.

    `.explain` shows PushedFilters on l_shipdate/l_quantity and a
    4-column ReadSchema — the 100 TB version scans only matching
    row groups.
    """
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
            & (F.col("l_quantity") >= 45)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "topk_orders_by_revenue",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    survey="J1,A3,L1 (top-k; TPC-H Q3 shape)",
)
def topk_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BUILDING-segment orders by revenue; ties broken by key so
    the result is deterministic. TakeOrderedAndProject — no full sort.

    Scale plan: semi-filter ``orders`` down to the surviving ~1/5 FIRST,
    so the big lineitem shuffle carries only matching orders; customer is
    fact-scaled, so no forced broadcast (AQE decides per actual size).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(cust, F.col("o_custkey") == cust.c_custkey, "left_semi")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", _disc_price_dec().alias("disc_price"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "exists_returned_lineitems",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
    survey="J3/F-family (EXISTS correlated predicate → left-semi join; TPC-H Q4 shape)",
)
def exists_returned_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS, Spark-first: the subquery becomes a left-semi
    join against the pre-filtered lineitem side — one shuffle on
    orderkey; Catalyst plans the same thing for the SQL EXISTS form."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "correlated_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT partkey, MIN(cost) AS min_cost FROM ps GROUP BY partkey
    )
    SELECT ps.partkey, MIN(ps.suppkey) AS best_suppkey,
           CAST(best.min_cost AS DOUBLE) AS min_cost
    FROM ps JOIN best ON ps.partkey = best.partkey AND ps.cost = best.min_cost
    GROUP BY ps.partkey, best.min_cost
    """,
    survey="J-family (correlated-min subquery → agg + re-join; TPC-H Q2 shape)",
)
def correlated_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'row matching the per-group minimum' pattern (TPC-H Q2's
    correlated subquery) decorrelated Spark-first: aggregate to the
    per-key minimum, re-join on (key, min) — two shuffles on the same
    key, which AQE plans back-to-back without re-partitioning. Ties on
    cost break to the lowest supplier for determinism."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    ps = li.groupBy("partkey", "suppkey").agg(F.min("price").alias("cost"))
    best = ps.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("cost").alias("b_min_cost")
    )
    return (
        ps.join(
            best,
            (F.col("partkey") == F.col("b_partkey")) & (F.col("cost") == F.col("b_min_cost")),
        )
        .groupBy("partkey", "b_min_cost")
        .agg(F.min("suppkey").alias("best_suppkey"))
        .select("partkey", "best_suppkey", F.col("b_min_cost").cast("double").alias("min_cost"))
    )


@query(
    "disjunctive_filter_scan",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE (l_quantity >= 45 AND l_discount >= 0.05)
       OR (l_quantity <= 5 AND l_returnflag = 'R')
       OR (l_linestatus = 'F' AND l_tax = 0.0)
    """,
    survey="F1 (disjunctive predicate pushdown; TPC-H Q19 shape)",
)
def disjunctive_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate: Catalyst pushes the full disjunction to the
    parquet scan (row-group stats can skip on each branch's column
    ranges) — the Q19 pattern that breaks naive pushdown rewrites."""
    li = table(spark, sf_dir, "lineitem")
    pred = (
        ((F.col("l_quantity") >= 45) & (F.col("l_discount") >= 0.05))
        | ((F.col("l_quantity") <= 5) & (F.col("l_returnflag") == "R"))
        | ((F.col("l_linestatus") == "F") & (F.col("l_tax") == 0.0))
    )
    return li.filter(pred).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_disc_price_dec()).cast("double").alias("revenue"),
    )


@query(
    "regional_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_DISC_PRICE_DEC}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    survey="J+ deep join tree (TPC-H Q5 shape: 6-way join, local-supplier volume per nation)",
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the deepest join tree in the registry: lineitem
    ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region with the
    local-supplier constraint (customer and supplier share a nation)
    and a one-year date window. Declared as six equi-joins and left to
    Catalyst: region/nation broadcast (constant-size dims), the date
    filter pushes into the orders scan, and AQE picks build sides for
    the rest — the query is the optimizer showcase, not hand-scheduled.
    Revenue uses the pricing_summary decimal idiom (IEEE product, exact
    DECIMAL(28,6) accumulation, double at the edge)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_disc_price_dec()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "keyset_pagination_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    -- keyset contract (round-13 composed-hazard find): the cursor
    -- tuple cannot represent a NULL key, and NULL-key rows made the
    -- page cut engine-dependent (placement defaults) — a real serving
    -- path paginates over a total NON-NULL key, so NULL keys are
    -- excluded outright in both engines
    WHERE o_orderkey IS NOT NULL
      AND (o_orderdate > TIMESTAMP '1996-06-01'
       OR (o_orderdate = TIMESTAMP '1996-06-01' AND o_orderkey > 1000))
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
    survey="S2/L1 serving path (keyset pagination: seek predicate + top-k, no OFFSET scan)",
)
def keyset_pagination_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The next page after cursor (1996-06-01, orderkey 1000) in
    (o_orderdate, o_orderkey) order — KEYSET pagination, the serving
    pattern that scales where OFFSET does not: the cursor becomes a
    seek predicate pushed into the parquet scan (row groups wholly
    before the cursor date never leave disk) and the page is a
    TakeOrderedAndProject top-k, so page N costs the same as page 1.
    An OFFSET formulation would scan and sort N·page rows — the
    difference between O(page) and O(corpus) at 100 TB. The row
    comparison is written in expanded form so both engines plan the
    identical predicate."""
    cursor_dt = F.lit("1996-06-01").cast("timestamp")
    after = (F.col("o_orderdate") > cursor_dt) | (
        (F.col("o_orderdate") == cursor_dt) & (F.col("o_orderkey") > 1000)
    )
    return (
        table(spark, sf_dir, "orders")
        # keyset keys are total and non-NULL (see the oracle comment)
        .filter(F.col("o_orderkey").isNotNull())
        .filter(after)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )


@query(
    "shipping_delay_audit",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
             AS BIGINT) AS n_shipped_before_order,
           CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS DOUBLE)
             / COUNT(*) AS avg_delay_days,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                          BETWEEN 0 AND 30 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS pct_within_30d
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey="§2.9 SLA audit (order-to-ship delay distribution per priority, Q12 shape)",
)
def shipping_delay_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA audit (the TPC-H Q12 shape on this reduced
    schema): per order priority, lineitem count, how many shipped
    BEFORE their order date (a data-quality violation the synthetic
    corpus deliberately contains), mean delay in days (exact integer
    day-sum, one IEEE division), and the share shipped within 30 days.

    Scale shape: the delay is computed on the join output of the two
    biggest tables — an orderkey equi-join both engines hash-partition;
    on a cluster the bucketed twin (bucketing.py) makes it shuffle-free.
    The aggregate lands on ≤ 5 priority keys, so partial aggregation
    collapses everything map-side after the join."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)).alias(
            "n_shipped_before_order"
        ),
        (F.sum(delay).cast("double") / F.count(F.lit(1))).alias("avg_delay_days"),
        (
            F.sum(F.when(delay.between(0, 30), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("pct_within_30d"),
    )
