"""Typed field decode (SURVEY §2.2 T1–T8): the engine's composed
equivalent of the reference's ``clean_item`` match statement
(`PodioApiWrapper.py:45-102`) — one pure column expression per field
type, composable into a single ``select``. Zero Python UDFs: every
rule below compiles to Catalyst expressions inside whole-stage
codegen.

Item shape (FIXTURES.md §1): a field carries
``values: array<struct<value,start,name,text,ref_item_id>>`` — the
typed slots of the reference's polymorphic ``value`` dict
(`PodioApiWrapper.py:56-69`): scalar types read ``value``, date reads
``start``, contact reads ``name`` (≙ value['value']['name']),
category reads ``text`` (≙ value['value']['text']), app-FK reads
``ref_item_id`` (≙ value['value']['item_id']).

The reference collapses every multi-value to a CSV string
(`','.join`, `PodioApiWrapper.py:61-78`); decoders keep the array
internally and expose the CSV form via ``concat_ws`` at the edge —
same observable behavior, but `explode`-able for relational access.

Unknown field types are quarantined (flag column), mirroring the
"email the CRM admin" skip path (`PodioApiWrapper.py:91-94`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the typed value-slot element (FIXTURES.md §1 values element)
VALUE_STRUCT = StructType(
    [
        StructField("value", StringType()),
        StructField("start", StringType()),
        StructField("name", StringType()),
        StructField("text", StringType()),
        StructField("ref_item_id", LongType()),
    ]
)
VALUES_TYPE = ArrayType(VALUE_STRUCT)

KNOWN_TYPES = (
    "date",
    "contact",
    "text",
    "category",
    "app",
    "phone",
    "email",
    "number",
    "location",
    "calculation",
    "money",
)

_HTML_TAG = "<[^>]*>"


def decode_date(values: Column) -> Column:
    """date: CSV-join of start strings (`PodioApiWrapper.py:60-61`)."""
    return F.concat_ws(",", F.transform(values, lambda v: v["start"]))


def decode_contact(values: Column) -> Column:
    """contact: nested value['value']['name'] join
    (`PodioApiWrapper.py:62-63`) — struct access v.name (T4)."""
    return F.concat_ws(",", F.transform(values, lambda v: v["name"]))


def decode_text(values: Column) -> Column:
    """text: HTML-strip then join (`PodioApiWrapper.py:64-65`)."""
    return F.concat_ws(
        ",", F.transform(values, lambda v: F.regexp_replace(v["value"], _HTML_TAG, ""))
    )


def decode_category(values: Column) -> Column:
    """category: nested value['value']['text'] join
    (`PodioApiWrapper.py:66-67`)."""
    return F.concat_ws(",", F.transform(values, lambda v: v["text"]))


def decode_app_fk(values: Column) -> Column:
    """app: referenced item_ids (`PodioApiWrapper.py:68-69`). Kept as
    array<long> — the joinable FK form; CSV edge via app_fk_csv."""
    return F.transform(values, lambda v: v["ref_item_id"])


def app_fk_csv(values: Column) -> Column:
    return F.concat_ws(",", F.transform(values, lambda v: v["ref_item_id"].cast("string")))


def decode_scalar(values: Column) -> Column:
    """phone | email | number | location: join of raw values
    (`PodioApiWrapper.py:70-71`)."""
    return F.concat_ws(",", F.transform(values, lambda v: v["value"]))


def decode_money(values: Column) -> Column:
    """money: first value only, numeric (`PodioApiWrapper.py:89-90`).
    DecimalType, not float — money at 100 TB must accumulate exactly."""
    return F.try_element_at(values, F.lit(1))["value"].try_cast("decimal(18,2)")


#: explicit formats tried after Spark's ISO-default parser — the common
#: human formats the reference's ``dateutil.parse`` accepts
#: (`PodioApiWrapper.py:77`) that the default parser does not. Coverage
#: is deliberately a fixed allowlist, not dateutil's fuzzy heuristics:
#: ambiguous forms (``97-06-05``, day-first vs month-first) stay
#: unparsed rather than silently guessed. Remaining divergence from
#: dateutil is characterized in tests/test_decode_properties.py.
EXTRA_DATE_FORMATS = ("MM/dd/yyyy", "yyyy/MM/dd", "MMM d, yyyy", "d MMM yyyy")


def parse_date_multi(col: Column) -> Column:
    """Timestamp from a messy string: Spark's ISO default, then each
    explicit format. All branches are codegen'd try_to_timestamp — a
    coalesce chain, no Python — and null when nothing matches (ANSI-safe)."""
    return F.coalesce(
        F.try_to_timestamp(col),
        *[F.try_to_timestamp(col, F.lit(f)) for f in EXTRA_DATE_FORMATS],
    )


def calculation_kind(values: Column) -> Column:
    """The polymorphic dispatch of `PodioApiWrapper.py:72-88`:
    date-range if 'start' present, else parseable-date, else numeric,
    else raw string — as a discriminator column."""
    first = F.try_element_at(values, F.lit(1))
    return (
        F.when(first["start"].isNotNull(), F.lit("date_range"))
        .when(parse_date_multi(first["value"]).isNotNull(), F.lit("date"))
        .when(first["value"].try_cast("double").isNotNull(), F.lit("number"))
        .otherwise(F.lit("string"))
    )


def decode_calculation_date(values: Column) -> Column:
    """date_range → CSV of starts (`PodioApiWrapper.py:73-74`);
    date → reformatted yyyy-MM-dd (`PodioApiWrapper.py:76-78`)."""
    first = F.try_element_at(values, F.lit(1))
    return F.when(
        first["start"].isNotNull(),
        F.concat_ws(",", F.transform(values, lambda v: v["start"])),
    ).when(
        parse_date_multi(first["value"]).isNotNull(),
        F.date_format(parse_date_multi(first["value"]), "yyyy-MM-dd"),
    )


def decode_calculation_number(values: Column) -> Column:
    """numeric branch: first element as double, null on failure
    (`PodioApiWrapper.py:79-88` try-float with first-element rule).
    Typed double column — the union type splits into typed columns
    instead of the reference's stringly-typed mix. try_cast, not cast:
    ANSI mode must not abort the batch on one malformed value."""
    first = F.try_element_at(values, F.lit(1))
    return F.when(first["start"].isNull(), first["value"].try_cast("double"))


def decode_calculation_raw(values: Column) -> Column:
    """string fallback: first element verbatim (`PodioApiWrapper.py:86-88`)."""
    return F.try_element_at(values, F.lit(1))["value"]


def is_known_type(field_type: Column) -> Column:
    """Quarantine predicate (`PodioApiWrapper.py:91-94`): unknown types
    never throw — they flag and pass through for the admin report."""
    return field_type.isin(*KNOWN_TYPES)
