"""Per-record transformation operators (SURVEY §2.2 T1–T9) as
driver-visible queries over the fixture tables. These queries exercise
the individual column expressions on oracle-checkable tables; the
composed CRM typed decode (`clean_item`, `PodioApiWrapper.py:45-102`)
is in crm_etl_pipeline_spark/decode.py (query: typed_field_decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query


@query(
    "html_strip_normalize",
    oracle="""
    SELECT doc_id,
           REGEXP_REPLACE(text, '<[^>]*>', '', 'g') AS clean_text,
           LENGTH(REGEXP_REPLACE(text, '<[^>]*>', '', 'g')) AS clean_len
    FROM documents WHERE doc_id < 100
    """,
    survey="T2 (HTML tag strip; PodioApiWrapper.py:65)",
)
def html_strip_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `re.sub(r'<.*?>','',v)` as a codegen'd
    regexp_replace — no Python in the loop."""
    clean = F.regexp_replace(F.col("text"), "<[^>]*>", "")
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", clean.alias("clean_text"), F.length(clean).alias("clean_len"))
    )


@query(
    "array_csv_roundtrip",
    oracle="""
    SELECT o_orderkey,
           ARRAY_TO_STRING(LIST(CAST(l_linenumber AS VARCHAR) ORDER BY l_linenumber), ',')
             AS linenumbers_csv,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey < 200
    GROUP BY o_orderkey
    """,
    survey="T3 (multi-value → CSV join; PodioApiWrapper.py:61-78)",
)
def array_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ArrayType internally, expose the reference's CSV form at the
    edge via concat_ws — sorted so both engines agree."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list("l_linenumber")), lambda x: x.cast("string"))
            ).alias("linenumbers_csv"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "date_parse_reformat",
    oracle="""
    SELECT STRFTIME(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_revenue
    FROM orders GROUP BY 1
    """,
    survey="T5 (date parse + strftime reformat; PodioApiWrapper.py:77-78)",
)
def date_parse_reformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dateutil.parse(...).strftime('%Y-%m-%d') ≙ date_format — monthly
    rollup keyed on the reformatted string."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("month_revenue"),
        )
    )


@query(
    "safe_numeric_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(SPLIT_PART(text, ' ', 1) AS DOUBLE) AS first_token_num,
           COALESCE(CAST(TRY_CAST(SPLIT_PART(text, ' ', 1) AS DOUBLE) AS VARCHAR),
                    SPLIT_PART(text, ' ', 1)) AS first_token_or_raw
    FROM documents WHERE doc_id < 200
    """,
    survey="T6 (try-float-else-string; PodioApiWrapper.py:81-88)",
)
def safe_numeric_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's try/except float() per element ≙ try_cast (null
    on failure) + coalesce fallback to the raw string."""
    first = F.split(F.col("text"), " ").getItem(0)
    num = first.try_cast("double")
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            num.alias("first_token_num"),
            F.coalesce(num.cast("string"), first).alias("first_token_or_raw"),
        )
    )


@query(
    "money_decimal_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_money,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_money
    FROM lineitem WHERE l_orderkey < 100
    """,
    survey="T7 (money must be DECIMAL at scale; PodioApiWrapper.py:89-90)",
)
def money_decimal_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money as DECIMAL(18,2) (the reference's float() is the bug this
    fixes at 100 TB); surfaced as double for the oracle hash."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_money"),
            # scale 4: the true product of two 2-decimal values has <=4
            # decimals, so no cross-engine rounding ties (scale 2 hits
            # exact .005 boundaries where Spark and DuckDB disagree)
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("net_money"),
        )
    )


@query(
    "system_column_enrichment",
    oracle="""
    SELECT event_id, user_id, ts AS event_ts,
           TRUE AS current, 0 AS failed_attempts,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_formatted
    FROM events WHERE event_type = 'signup'
    """,
    survey="T9 (system-column enrichment; PodioApiGateway.py:82-83,127-128)",
)
def system_column_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-time system columns: current flag, retry counter, and the
    reference's lexicographically-sortable timestamp string format."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("event_ts"),
            F.lit(True).alias("current"),
            F.lit(0).alias("failed_attempts"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_formatted"),
        )
    )
