"""SCD2 versioned-store queries (SURVEY §2.4 L2/L3/L5/L6): the driver-
visible face of crm_etl_pipeline_spark/scd.py.

The fixture replay (FIXTURES.md §5): ``customer`` plays the initial
item load (one base version per key, epoch timestamp) and ``events``
of type purchase/signup play the webhook updates keyed by user_id —
together they produce a `podio_items`-shaped versioned store
(`PodioApiGateway.py:131-137`). All derived flags are recomputed
deterministically, so a DuckDB window oracle can verify every row.

``scd2_store_roundtrip`` exercises the ACTUAL write path: it
materializes the store to parquet partitioned by is_current and reads
it back — the first df.write in the engine — and still matches the
same oracle because the round trip is lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import scd
from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query

_BASE_TS = "1990-01-01 00:00:00"

_STORE_SQL = f"""
    WITH base AS (
      SELECT c_custkey AS item_id, 0 AS event_id,
             TIMESTAMP '{_BASE_TS}' AS ts,
             c_acctbal AS value
      FROM customer
    ), upd AS (
      SELECT user_id AS item_id, event_id, ts, value
      FROM events WHERE event_type IN ('purchase', 'signup')
    ), all_v AS (
      -- MIN-winner identity collapse, mirroring scd2_apply: a
      -- byte-identical at-least-once re-delivery must not mint a
      -- second version (round-8 dup_events contract — MIN of equal
      -- rows is the row, so this subsumes the old DISTINCT), and a
      -- COLLIDED identity (round-10 id_collision_customer probe: two
      -- base rows share (item_id, BASE_TS, 0) with different values —
      -- no tiebreaker can order them) resolves to the deterministic
      -- MIN(value) winner instead of a version-order coin flip
      SELECT item_id, event_id, ts, MIN(value) AS value FROM (
        SELECT * FROM base UNION ALL SELECT * FROM upd
      ) GROUP BY item_id, event_id, ts
    ), v AS (
      SELECT item_id, event_id, ts, value,
             -- placement spelled to Spark's defaults (round-13
             -- const_ts_null_ids find: a NULL event_id among tied
             -- timestamps placed first in Spark, last in DuckDB,
             -- shifting every version number after it); the all_v
             -- collapse guarantees (item_id, event_id, ts) uniqueness,
             -- so no tie survives the spelled keys
             CAST(ROW_NUMBER() OVER
                  (PARTITION BY item_id
                   ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS INT) AS version,
             ROW_NUMBER() OVER
                  (PARTITION BY item_id
                   ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) = 1 AS is_current
      FROM all_v
    )
"""


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select(
            F.col("user_id").alias("item_id"),
            "event_id",
            "ts",
            "value",
        )
    )


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pure projection: a collided c_custkey (two base rows sharing the
    # (item_id, BASE_TS, 0) identity with different values) is resolved
    # by scd2_apply's deterministic MIN-winner identity collapse — the
    # same shuffle the version windows already pay, zero extra stages
    # (round-10 id_collision_customer contract; see scd.scd2_apply)
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("item_id"),
        F.lit(0).cast("bigint").alias("event_id"),
        F.lit(_BASE_TS).cast("timestamp").alias("ts"),
        F.col("c_acctbal").alias("value"),
    )


def _store(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd.scd2_apply(_base(spark, sf_dir), _updates(spark, sf_dir))


@query(
    "scd2_versioned_store",
    oracle=_STORE_SQL + "SELECT item_id, event_id, ts, value, version, is_current FROM v",
    survey="L3 (SCD2 upsert: flip current:0 / insert current:1; PodioApiGateway.py:132-137)",
)
def scd2_versioned_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full version history after replaying all updates: every row
    keeps its data, flags derived by key-partitioned windows (one
    shuffle on item_id — high cardinality, scale-safe)."""
    return _store(spark, sf_dir).select(
        "item_id", "event_id", "ts", "value", "version", "is_current"
    )


@query(
    "scd2_current_view",
    oracle=_STORE_SQL
    + """
    SELECT item_id, event_id, ts, value, version
    FROM v WHERE is_current AND value >= 100
    """,
    survey="L2 (latest-version lookup; PodioApiGateway.py:165)",
)
def scd2_current_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The current=1 projection the reference maintains eagerly; here a
    filter that, on a write_store layout, prunes to current=true files."""
    return (
        scd.current_view(_store(spark, sf_dir))
        .filter(F.col("value") >= 100)
        .select("item_id", "event_id", "ts", "value", "version")
    )


@query(
    "scd2_soft_delete",
    oracle=_STORE_SQL
    + """
    , del AS (
      SELECT user_id AS item_id, MAX(ts) AS delete_ts
      FROM events WHERE event_type = 'error' AND value > 90
      GROUP BY user_id
    )
    SELECT v.item_id, v.event_id, v.ts, v.value, v.version,
           v.is_current AND del.delete_ts IS NOT NULL AS deleted,
           del.delete_ts
    FROM v LEFT JOIN del ON v.item_id = del.item_id
    """,
    survey="L6 (soft delete on latest version, history kept; PodioApiGateway.py:161-178)",
)
def scd2_soft_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-delete replay: high-value error events mark the item's
    current version deleted=true; superseded rows and history survive
    untouched (`PodioApiGateway.py:166-169`)."""
    deletes = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .groupBy(F.col("user_id").alias("item_id"))
        .agg(F.max("ts").alias("delete_ts"))
    )
    return scd.soft_delete(_store(spark, sf_dir), deletes).select(
        "item_id", "event_id", "ts", "value", "version", "deleted", "delete_ts"
    )


@query(
    "scd2_store_roundtrip",
    oracle=_STORE_SQL
    + """
    SELECT item_id, event_id, ts, value, version
    FROM v WHERE is_current
    """,
    survey="L5 (append/write to versioned store + partition-pruned readback; PodioApiGateway.py:137)",
)
def scd2_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the store to parquet partitioned by is_current, read the
    current view back. The readback filter hits only the
    is_current=true partition directory (partition pruning — at 100 TB
    the current view never touches historical files)."""
    path = os.path.join(
        tempfile.gettempdir(),
        f"crm_etl_scd2_store_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    scd.write_store(_store(spark, sf_dir), path)
    readback = scd.read_store(spark, path)
    return scd.current_view(readback).select(
        "item_id", "event_id", "ts", "value", "version"
    )


_ASOF_TS = "2024-01-15 00:00:00"


@query(
    "scd2_asof_snapshot",
    oracle=_STORE_SQL
    + f"""
    SELECT item_id, event_id, ts, value, version
    FROM v WHERE ts <= TIMESTAMP '{_ASOF_TS}'
    QUALIFY ROW_NUMBER() OVER (PARTITION BY item_id
                               ORDER BY ts DESC NULLS LAST,
                                        event_id DESC NULLS LAST) = 1
    """,
    survey="L2/L3 time travel (as-of snapshot of the versioned store; PodioApiGateway.py:131-137)",
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store as of mid-replay (2024-01-15): what every record
    looked like at that instant — the question the reference's
    versioned `podio_items` collection exists to answer but can only
    approach with hand-written Mongo queries. Keys with no version yet
    are absent; each surviving key carries the version number it had
    then (the stored version equals the rank among versions at or
    before any cut, so no recompute). A filter plus one pruned window
    head over the append-only log — time travel without a store
    format."""
    return scd.asof_view(_store(spark, sf_dir), _ASOF_TS).select(
        "item_id", "event_id", "ts", "value", "version"
    )


@query(
    "scd2_expire_versions",
    oracle=_STORE_SQL
    + f"""
    , s AS (
      SELECT item_id, event_id, ts, value, version, is_current,
             LEAD(ts) OVER (PARTITION BY item_id
                            ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS nxt
      FROM v
    )
    SELECT item_id, event_id, ts, value, version, is_current
    FROM s WHERE nxt IS NULL OR nxt > TIMESTAMP '{_ASOF_TS}'
    """,
    survey="L3/L5 retention (snapshot expiry over the version log: GC every version no post-horizon time travel can surface)",
)
def scd2_expire_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention GC — the missing half of keep-every-version: the
    reference's `podio_items` grows without bound
    (`PodioApiGateway.py:131-137`), and so does this engine's
    append-only log; a real 100 TB store reclaims. The expiry keeps
    exactly the versions some time-travel read at or after the horizon
    (the same mid-replay instant ``scd2_asof_snapshot`` travels to)
    can still surface: a version dies iff its successor's ts has
    passed the horizon. Current rows always survive; so does each
    key's version that was live AT the horizon — asof_view at any
    t >= horizon is bit-identical on the expired store
    (tests/test_scd.py pins it, plus the invariant that something was
    actually reclaimed). Historical version numbers survive with gaps,
    the audit trail that GC ran.

    Scale shape: one lead() window on the item_id partitioning every
    store read already pays, then a filter — no extra shuffle; on the
    is_current-partitioned layout the rewrite touches only
    is_current=false files. The oracle replays the same rule as a
    LEAD window over the store SQL, so the hash certifies the exact
    survivor set, flags and versions included."""
    return scd.expire_versions(_store(spark, sf_dir), _ASOF_TS).select(
        "item_id", "event_id", "ts", "value", "version", "is_current"
    )
