"""Composed typed-decode query (SURVEY §2.2 T1 end-to-end): builds
CRM-shaped items (FIXTURES.md §1) from the fixture tables inside the
query — customer plays a "Customers" app item, its latest order plays
the app-FK/date/money fields — then runs the full decode.decode_*
pipeline over the nested struct array.

The DuckDB oracle does NOT replicate the struct intermediate: it
computes the same final values directly from the base tables, so the
comparison proves build→decode is lossless end-to-end (strip(html(x))
== x, FK round trip, polymorphic calculation dispatch, quarantine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import decode
from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query


def _val(
    value: Column | None = None,
    start: Column | None = None,
    name: Column | None = None,
    text: Column | None = None,
    ref_item_id: Column | None = None,
) -> Column:
    """One typed value-slot element (decode.VALUE_STRUCT)."""
    null_s = F.lit(None).cast("string")
    return F.struct(
        (value if value is not None else null_s).alias("value"),
        (start if start is not None else null_s).alias("start"),
        (name if name is not None else null_s).alias("name"),
        (text if text is not None else null_s).alias("text"),
        (ref_item_id if ref_item_id is not None else F.lit(None).cast("long")).alias(
            "ref_item_id"
        ),
    )


def _field(field_id: int, label: str, ftype: Column | str, values: Column) -> Column:
    ftype_col = F.lit(ftype) if isinstance(ftype, str) else ftype
    return F.struct(
        F.lit(field_id).alias("field_id"),
        F.lit(label).alias("label"),
        ftype_col.alias("type"),
        values.alias("values"),
    )


def _values_of(fields: Column, field_id: int) -> Column:
    """Extract one field's values from the dynamic array by id — the
    engine analog of the reference's per-field dict probe."""
    return F.try_element_at(F.filter(fields, lambda f: f["field_id"] == field_id), F.lit(1))["values"]


def _empty_values() -> Column:
    # built lazily: F.array() needs an active SparkContext
    return F.array().cast(decode.VALUES_TYPE)


def build_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble FIXTURES.md §1 items: every §1.2 field type present,
    multi-valued where the reference allows it, `calculation`
    polymorphic by c_custkey % 4, and an unknown 'blob' field on every
    10th item (quarantine path)."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    latest = (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )
    c = table(spark, sf_dir, "customer").join(
        latest, F.col("c_custkey") == F.col("o_custkey"), "left"
    )
    has_order = F.col("o_orderkey").isNotNull()
    day_fmt = "yyyy-MM-dd"
    calc_branch = F.col("c_custkey") % 4
    calc_values = (
        F.when(calc_branch == 0, F.array(_val(start=F.concat(F.lit("1996-06-0"), (F.col("c_custkey") % 9 + 1).cast("string")))))
        .when(calc_branch == 1, F.array(_val(value=F.lit("1997-03-15"))))
        .when(calc_branch == 2, F.array(_val(value=F.col("c_acctbal").cast("string"))))
        .otherwise(F.array(_val(value=F.col("c_name"))))
    )
    base_fields = F.array(
        _field(1, "name", "text", F.array(_val(value=F.concat(F.lit("<b>"), F.col("c_name"), F.lit("</b>"))))),
        _field(2, "segment", "category", F.array(_val(text=F.col("c_mktsegment")))),
        _field(
            3,
            "contacts",
            "contact",
            F.array(
                _val(name=F.col("c_name")),
                _val(name=F.concat(F.lit("Account Mgr "), F.col("c_nationkey").cast("string"))),
            ),
        ),
        _field(
            4,
            "order_dates",
            "date",
            F.when(
                has_order,
                F.array(
                    _val(start=F.date_format("o_orderdate", day_fmt)),
                    _val(start=F.date_format(F.timestamp_add("DAY", F.lit(1), F.col("o_orderdate")), day_fmt)),
                ),
            ).otherwise(_empty_values()),
        ),
        _field(
            5,
            "latest_order",
            "app",
            F.when(has_order, F.array(_val(ref_item_id=F.col("o_orderkey")))).otherwise(_empty_values()),
        ),
        _field(6, "nation_code", "number", F.array(_val(value=F.col("c_nationkey").cast("string")))),
        _field(7, "computed", "calculation", calc_values),
        _field(
            8,
            "order_value",
            "money",
            F.when(has_order, F.array(_val(value=F.col("o_totalprice").cast("string")))).otherwise(
                _empty_values()
            ),
        ),
    )
    fields = F.when(
        F.col("c_custkey") % 10 == 0,
        F.concat(base_fields, F.array(_field(9, "attachment", "blob", _empty_values()))),
    ).otherwise(base_fields)
    return c.select(F.col("c_custkey").alias("item_id"), fields.alias("fields"))


@query(
    "typed_field_decode",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT c_custkey AS item_id,
           c_name AS clean_name,
           c_mktsegment AS segment,
           c_name || ',Account Mgr ' || CAST(c_nationkey AS VARCHAR) AS contacts,
           COALESCE(strftime(o_orderdate, '%Y-%m-%d') || ',' ||
                    strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d'), '') AS order_dates,
           o_orderkey AS fk_orderkey,
           CAST(c_nationkey AS VARCHAR) AS scalar_value,
           CASE CAST(c_custkey % 4 AS INT)
                WHEN 0 THEN 'date_range' WHEN 1 THEN 'date'
                WHEN 2 THEN 'number' ELSE 'string' END AS calc_kind,
           CASE CAST(c_custkey % 4 AS INT)
                WHEN 0 THEN '1996-06-0' || CAST(c_custkey % 9 + 1 AS VARCHAR)
                WHEN 1 THEN '1997-03-15' END AS calc_date,
           CASE CAST(c_custkey % 4 AS INT) WHEN 2 THEN c_acctbal END AS calc_number,
           CASE CAST(c_custkey % 4 AS INT) WHEN 3 THEN c_name END AS calc_raw,
           CAST(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS money_amount,
           CAST(CASE WHEN c_custkey % 10 = 0 THEN 9 ELSE 8 END AS INT) AS n_fields,
           c_custkey % 10 = 0 AS is_quarantined
    FROM customer LEFT JOIN latest ON c_custkey = o_custkey
    """,
    survey="T1,T4 (composed clean_item decode over CRM structs; PodioApiWrapper.py:45-102)",
)
def typed_field_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full clean_item pipeline: build nested items, decode every
    field type, flag unknown types. All nested access is struct-field
    navigation on array<struct> columns — codegen'd, no Python."""
    items = build_items(spark, sf_dir)
    f = F.col("fields")
    calc_vals = _values_of(f, 7)
    calc_kind = decode.calculation_kind(calc_vals)
    return items.select(
        "item_id",
        decode.decode_text(_values_of(f, 1)).alias("clean_name"),
        decode.decode_category(_values_of(f, 2)).alias("segment"),
        decode.decode_contact(_values_of(f, 3)).alias("contacts"),
        decode.decode_date(_values_of(f, 4)).alias("order_dates"),
        F.try_element_at(decode.decode_app_fk(_values_of(f, 5)), F.lit(1)).alias("fk_orderkey"),
        decode.decode_scalar(_values_of(f, 6)).alias("scalar_value"),
        calc_kind.alias("calc_kind"),
        decode.decode_calculation_date(calc_vals).alias("calc_date"),
        decode.decode_calculation_number(calc_vals).alias("calc_number"),
        F.when(calc_kind == "string", decode.decode_calculation_raw(calc_vals)).alias("calc_raw"),
        decode.decode_money(_values_of(f, 8)).cast("double").alias("money_amount"),
        F.size("fields").alias("n_fields"),
        (F.size(F.filter(f, lambda fld: ~decode.is_known_type(fld["type"]))) > 0).alias(
            "is_quarantined"
        ),
    )
