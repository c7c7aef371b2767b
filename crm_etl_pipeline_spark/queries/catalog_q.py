"""Catalog-layer driver queries (SURVEY §2.1 S3–S6, §2.2 T10–T11,
§2.3 F4–F5) over the region/nation dims, which play org-spaces/apps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark.catalog import build_catalog, drift_diff, split_composite_key
from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query


@query(
    "catalog_tree",
    oracle="""
    SELECT r_regionkey AS space_id, r_name AS space_name,
           n_nationkey AS app_id, n_name AS app_name,
           CONCAT_WS('.', r_regionkey, n_nationkey) AS space_app_id
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name <> 'EUROPE'
    """,
    survey="S3,S4,S6,T10,F4 (catalog sync; PodioApiWrapper.py:239-268)",
)
def catalog_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Org→space→app catalog walk as one broadcast join, with the
    reference's space-exclusion filter (`PodioApiWrapper.py:254`)."""
    spaces = (
        table(spark, sf_dir, "region")
        .select(F.col("r_regionkey").alias("space_id"), F.col("r_name").alias("space_name"))
    )
    apps = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("app_id"),
        F.col("n_name").alias("app_name"),
        F.col("n_regionkey").alias("space_id"),
    )
    return build_catalog(spaces, apps, exclude_space="EUROPE")


@query(
    "composite_key_roundtrip",
    oracle="""
    SELECT CONCAT_WS('.', r_regionkey, n_nationkey) AS space_app_id,
           CAST(r_regionkey AS BIGINT) AS space_id_part,
           CAST(n_nationkey AS BIGINT) AS app_id_part
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    survey="T10 (composite key build/split; PodioApiWrapper.py:201,260)",
)
def composite_key_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build '{space}.{app}' then split it back — the reference does the
    same string round-trip between sync passes."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    built = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        F.concat_ws(".", F.col("r_regionkey"), F.col("n_nationkey")).alias("space_app_id")
    )
    return split_composite_key(built)


@query(
    "return_type_fallback",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), o_orderpriority) AS effective_type
    FROM orders
    """,
    survey="T11,F3 (return_type-else-type fallback; PodioApiWrapper.py:230-233)",
)
def return_type_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`coalesce(return_type, type)` pattern: NULLIF fabricates the
    missing-override case deterministically from fixture data."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.col("o_orderpriority")).alias(
            "effective_type"
        ),
    )


@query(
    "catalog_drift",
    oracle="""
    WITH old AS (
      SELECT n_nationkey AS field_id, n_name AS field_label, n_regionkey AS field_type
      FROM nation WHERE n_regionkey <= 3
    ), new AS (
      SELECT n_nationkey AS field_id,
             CASE WHEN n_nationkey % 7 = 0 THEN n_name || '_RENAMED' ELSE n_name END AS field_label,
             n_regionkey AS field_type
      FROM nation WHERE n_regionkey >= 1
    )
    SELECT COALESCE(o.field_id, n.field_id) AS field_id,
           CASE WHEN o.field_id IS NULL THEN 'added'
                WHEN n.field_id IS NULL THEN 'dropped'
                WHEN o.field_label IS DISTINCT FROM n.field_label
                  OR o.field_type IS DISTINCT FROM n.field_type THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.field_label AS old_field_label, o.field_type AS old_field_type,
           n.field_label AS new_field_label, n.field_type AS new_field_type
    FROM old o FULL OUTER JOIN new n ON o.field_id = n.field_id
    """,
    survey="S6 drift (twice-daily metadata refresh; PodioApiWrapper.py:13, README.md:18)",
)
def catalog_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift between two catalog snapshots: one dropped region,
    one added, some renamed fields — classified by full-outer join."""
    nation = table(spark, sf_dir, "nation")
    old = nation.filter(F.col("n_regionkey") <= 3).select(
        F.col("n_nationkey").alias("field_id"),
        F.col("n_name").alias("field_label"),
        F.col("n_regionkey").alias("field_type"),
    )
    new = nation.filter(F.col("n_regionkey") >= 1).select(
        F.col("n_nationkey").alias("field_id"),
        F.when(F.col("n_nationkey") % 7 == 0, F.concat(F.col("n_name"), F.lit("_RENAMED")))
        .otherwise(F.col("n_name"))
        .alias("field_label"),
        F.col("n_regionkey").alias("field_type"),
    )
    return drift_diff(old, new, "field_id", ["field_label", "field_type"])
