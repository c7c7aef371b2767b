"""Event-queue operators in batch form (SURVEY §2.3 F2/F3/F6, §2.4
L1/L4/L7, §2.7 ST5–ST6). The same logic runs streaming inside
``foreachBatch`` (see crm_etl_pipeline_spark/streaming.py); batch form
is what the DuckDB oracle can verify.

Reference parity: the worker pops the oldest pending event
(`PodioApiGateway.py:190`), filters to item.update/item.create
(`PodioApiGateway.py:120`), collapses queued duplicates per key once
one completes (`PodioApiGateway.py:143-145`), requeues failures with
``failed_attempts + 1`` and dead-letters at >= 10
(`PodioApiGateway.py:153-159`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query


@query(
    "fifo_head",
    oracle="""
    -- placement spelled + FULL output-column tiebreak (round-13
    -- const_ts_null_ids find: tied-ts NULL-id rows made the LIMIT cut
    -- engine-dependent); ties beyond all four keys are identical rows
    SELECT event_id, ts, user_id, event_type
    FROM events ORDER BY ts NULLS FIRST, event_id NULLS FIRST,
                         user_id NULLS FIRST, event_type NULLS FIRST LIMIT 5
    """,
    survey="L1 (FIFO pop, oldest first; PodioApiGateway.py:190)",
)
def fifo_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oldest pending events — TakeOrderedAndProject, no full sort."""
    return (
        table(spark, sf_dir, "events")
        .orderBy(
            # placement + full tiebreak spelled (round-13 find)
            F.col("ts").asc_nulls_first(),
            F.col("event_id").asc_nulls_first(),
            F.col("user_id").asc_nulls_first(),
            F.col("event_type").asc_nulls_first(),
        )
        .limit(5)
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "event_type_routing",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    """,
    survey="F2,F3 (event-type IN filter + routing; PodioApiGateway.py:120)",
)
def event_type_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The webhook IN-list filter + per-route aggregation."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "event_dedup_last_write_wins",
    oracle="""
    SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts, value AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    survey="L4,ST6 (duplicate collapse per key, last wins; PodioApiGateway.py:143-145)",
)
def event_dedup_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: newest event per (user, type). This is
    `dropDuplicates` made reproducible via an explicit window."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "retry_and_dead_letter",
    oracle="""
    SELECT event_id, user_id, failed_attempts + 1 AS failed_attempts,
           CASE WHEN failed_attempts + 1 >= 10 THEN 'dead_letter' ELSE 'requeue' END AS disposition
    FROM (
      SELECT event_id, user_id, CAST(FLOOR(value) AS INT) % 12 AS failed_attempts
      FROM events WHERE event_type = 'error'
    )
    """,
    survey="F6,L7,ST3,ST4 (retry requeue + DLQ at >=10; PodioApiGateway.py:153-159)",
)
def retry_and_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure branch: increment failed_attempts, route to requeue or
    dead-letter (attempt counter derived deterministically from value)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            (F.floor(F.col("value")).cast("int") % 12).alias("failed_attempts"),
        )
    )
    bumped = F.col("failed_attempts") + 1
    return ev.select(
        "event_id",
        "user_id",
        bumped.alias("failed_attempts"),
        F.when(bumped >= 10, F.lit("dead_letter")).otherwise(F.lit("requeue")).alias("disposition"),
    )


@query(
    "tumbling_daily_counts",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n,
           -- VARCHAR-routed edge cast: correctly rounded decimal ->
           -- double in both engines (extreme_values probe; see
           -- salted_user_event_totals)
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_value
    FROM events GROUP BY 1, 2
    """,
    survey="ST-windows (tumbling agg, batch form of watermark+window)",
)
def tumbling_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows over event time; the streaming twin uses
    withWatermark + window() (crm_etl_pipeline_spark/streaming.py)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 OR
                       LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
    """,
    survey="ST-windows (session windows: lag + gap + cumsum)",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: lag → gap flag → running sum as
    session id → per-session aggregate. The streaming twin is
    session_window(ts, '30 minutes')."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    # gap compare at full µs precision — identically-truncated integers in
    # both engines (oracle uses EPOCH_US), so boundary gaps classify the same
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 30 * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        table(spark, sf_dir, "events")
        .withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "session_window_builtin",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 1800000000 OR
                       LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end_ext,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    survey="ST-windows (built-in session_window operator; merge-on-overlap semantics)",
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` operator —
    the declarative twin of the lag+cumsum formulation above, and the
    form that runs unchanged under Structured Streaming with a
    watermark. Semantics differ at the exact-gap boundary: windows
    ``[ts, ts+gap)`` merge on OVERLAP, so a gap of exactly 30 min
    starts a new session (the oracle mirrors with ``>=``), and the
    window end is ``last_event + gap``, not ``last_event``.

    Scale: Spark plans this as a single shuffle on user_id followed by
    an in-partition merge sort — same shape as the window variant but
    without materializing per-row session ids.
    """
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end_ext"),
            "n_events",
        )
    )


@query(
    "props_json_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(REGEXP_EXTRACT(props, '"k": (-?\\d+)', 1) AS BIGINT) AS k_value
    FROM events WHERE event_type = 'click'
    """,
    survey="T6,T8 (safe scalar extraction from semi-structured payload)",
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed scalar from the JSON props payload — the
    engine-native version of the reference's per-row dict probing."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            # no-match yields '' — try_cast(NULL) mirrors the oracle's
            # TRY_CAST instead of an ANSI CAST_INVALID_INPUT crash on a
            # malformed payload
            F.regexp_extract(F.col("props"), r'"k": (-?\d+)', 1)
            .try_cast("long")
            .alias("k_value"),
        )
    )


@query(
    "props_from_json_typed",
    oracle="""
    WITH parsed AS (
      -- mirror Spark's PERMISSIVE from_json(LongType): malformed JSON,
      -- a missing key, a non-integral value (quoted "12", 1.5, or an
      -- out-of-range number) are ALL NULL — never an error and never a
      -- string/double coercion (raw json_extract CAST crashes on the
      -- first and coerces the others)
      SELECT event_type,
             CASE WHEN json_valid(props)
                   AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM parsed GROUP BY event_type
    """,
    survey="T4,T6,T8 (schema-on-read JSON parse via from_json; typed struct access)",
)
def props_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the semi-structured payload: ``from_json``
    with an explicit schema (the idiomatic upgrade of the regex probe in
    props_json_extract), then plain struct-field access and typed
    aggregation. Unknown/missing keys surface as NULL, never as errors
    — the same tolerance the reference's dict probing has. JSON parsing
    is codegen'd JVM work; one single-scan groupBy on a 5-value key."""
    from pyspark.sql.types import LongType, StructField, StructType

    props_schema = StructType([StructField("k", LongType())])
    k = F.from_json(F.col("props"), props_schema)["k"]
    return (
        table(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "cdc_apply_snapshot",
    oracle="""
    WITH ops AS (
      SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'purchase' THEN 'U'
                             WHEN 'error' THEN 'D' END AS op
      FROM events
      WHERE event_type IN ('signup', 'purchase', 'error')
    ), counted AS (
      SELECT user_id, COUNT(*) AS n_ops FROM ops GROUP BY user_id
    ), last AS (
      SELECT user_id, op AS last_op, ts AS last_ts, value AS last_value
      FROM ops QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT l.user_id, last_op, last_ts, last_value, n_ops
    FROM last l JOIN counted USING (user_id)
    WHERE last_op <> 'D'
    """,
    survey="L3-L6 (CDC op-typed apply: I/U/D log folded to the live snapshot; PodioApiGateway.py:111-178)",
)
def cdc_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-style CDC apply: the event stream read as an op-typed
    change log (signup→INSERT, purchase→UPDATE, error→DELETE on the
    user entity) folded into the final snapshot — last op per key wins
    in (ts, event_id) order, a trailing DELETE removes the key, a
    later re-INSERT resurrects it. This is the op-typed complement to
    the SCD2 path (which keeps history; CDC apply keeps only the live
    image — the reference's drafted hard-delete branch,
    PodioApiGateway.py:219-234, is exactly this fold).

    Scale shape: one partitioned window to find each key's last op
    (WindowGroupLimit prunes map-side) plus one key-grain count —
    O(changelog) with no per-key iteration, the standard snapshot
    materialization for a merge-on-read CDC table."""
    ops = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.when(F.col("event_type") == "signup", "I")
            .when(F.col("event_type") == "purchase", "U")
            .otherwise("D")
            .alias("op"),
        )
    )
    counted = ops.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ops"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    last = (
        ops.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )
    return last.join(counted, "user_id").filter(F.col("last_op") != "D")


_CDC_CUTOFF = "2024-01-15 00:00:00"


def _snapshot_asof(spark: SparkSession, sf_dir: str, upper_ts: str | None) -> DataFrame:
    """Live user snapshot from the op-typed change log as of ``upper_ts``
    (exclusive; None = full log) — cdc_apply_snapshot's fold, bounded."""
    ops = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase", "error"))
    )
    if upper_ts is not None:
        ops = ops.filter(F.col("ts") < F.lit(upper_ts).cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("event_type") != "error")  # trailing D = key absent
        .select("user_id", F.col("ts").alias("img_ts"), F.col("value").alias("img_value"))
    )


@query(
    "cdc_derive_changes",
    oracle=f"""
    WITH ops AS (
      SELECT user_id, ts, event_id, value, event_type
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
    ), snap_a AS (
      SELECT user_id, ts AS img_ts, value AS img_value
      FROM ops WHERE ts < TIMESTAMP '{_CDC_CUTOFF}'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1
              AND event_type <> 'error'
    ), snap_b AS (
      SELECT user_id, ts AS img_ts, value AS img_value
      FROM ops
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1
              AND event_type <> 'error'
    )
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           CASE WHEN a.user_id IS NULL THEN 'I'
                WHEN b.user_id IS NULL THEN 'D'
                ELSE 'U' END AS op,
           a.img_ts AS old_ts,
           b.img_ts AS new_ts,
           b.img_value AS new_value
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.user_id = b.user_id
    WHERE a.user_id IS NULL OR b.user_id IS NULL OR a.img_ts <> b.img_ts
    """,
    survey="L3-L6,ST9 (CDC derive: snapshot diff emits the minimal I/U/D change set — the inverse of cdc_apply_snapshot)",
)
def cdc_derive_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — the CDC *producer* side: given the live
    image at the mid-month cutoff and the live image now, emit the
    minimal op-typed change set (I for new keys, D for vanished keys,
    U where the image moved). Applying this set to the old snapshot
    reproduces the new one exactly (proven by
    tests/test_gateway_cdc.py::test_cdc_roundtrip_derive_then_apply),
    which is the defining roundtrip of a CDC pipeline — the reference
    registers webhooks to RECEIVE such deltas (`PodioApiWrapper.py:
    296-316`); deriving them from snapshots is what you do when the
    upstream has no webhook.

    Scale shape: two bounded-window folds over the change log (each
    WindowGroupLimit-pruned map-side) and ONE key-grain full-outer
    sort-merge join; no all-pairs work anywhere. At 100 TB the two
    snapshots would be stored tables and this is a single co-partitioned
    full-outer join — bucket both snapshots on user_id and it is
    shuffle-free (the bucketed_join_colocated machinery)."""
    a = _snapshot_asof(spark, sf_dir, _CDC_CUTOFF)
    b = _snapshot_asof(spark, sf_dir, None)
    joined = a.alias("a").join(b.alias("b"), F.col("a.user_id") == F.col("b.user_id"), "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
            F.when(F.col("a.user_id").isNull(), "I")
            .when(F.col("b.user_id").isNull(), "D")
            .otherwise("U")
            .alias("op"),
            F.col("a.img_ts").alias("old_ts"),
            F.col("b.img_ts").alias("new_ts"),
            F.col("b.img_value").alias("new_value"),
        )
        .filter(
            F.col("old_ts").isNull()
            | F.col("new_ts").isNull()
            | (F.col("old_ts") != F.col("new_ts"))
        )
    )


@query(
    "session_path_trigrams",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), grams AS (
      SELECT event_type || '>' || LEAD(event_type, 1) OVER s
                        || '>' || LEAD(event_type, 2) OVER s AS trigram
      FROM sessions
      WINDOW s AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT trigram, COUNT(*) AS n_paths
    FROM grams WHERE trigram IS NOT NULL
    GROUP BY trigram
    ORDER BY n_paths DESC, trigram LIMIT 20
    """,
    survey="§2.9 CRM analytics (clickstream path mining: top session trigrams, L1/window machinery)",
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the 20 most frequent 3-step event-type
    paths occurring INSIDE a 30-minute-gap session (the sessionization
    query's exact boundary rule, so the two operators agree on what a
    session is). Trigrams come from two leads over the (user, session)
    window — lead returns NULL past the session edge, so no path ever
    crosses a session boundary by construction rather than by filter.

    Scale shape: the same bounded per-user windows sessionization pays
    (one shuffle on user_id; the concat-lead adds no extra exchange
    because the second window partitions by a prefix-compatible key),
    then a trigram-key groupBy whose cardinality is at most
    |event_types|³ = 125 — partial aggregation collapses everything
    map-side, and top-20 compiles to TakeOrderedAndProject (no global
    window). Ties break on the trigram string in both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 30 * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessions = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
    )
    s = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    trigram = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(s),
        F.lead("event_type", 2).over(s),
    )
    grams = sessions.select(
        trigram.alias("trigram"),
        F.lead("event_type", 2).over(s).alias("_l2"),
    ).filter(F.col("_l2").isNotNull())
    return (
        grams.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("trigram"))
        .limit(20)
    )


def _props_envelope() -> F.Column:
    """The deterministic JSON envelope variant_props_shred parses: the
    raw props payload nested one level down, an engine-built string
    array and integer sibling (so object paths, array indexing and
    typed casts are all exercised), malformed on every
    event_id % 97 == 0 row. Shared with tests/test_spark4_surface.py
    so the schema-inference invariant pins the SAME construction."""
    return F.when(F.col("event_id") % 97 == 0, F.lit("{not json")).otherwise(
        F.concat(
            F.lit('{"payload": '),
            F.col("props"),
            F.lit(', "tags": ["t'),
            (F.col("event_id") % 3).cast("string"),
            F.lit('","u'),
            (F.col("user_id") % 5).cast("string"),
            F.lit('"], "rank": '),
            (F.col("event_id") % 7).cast("string"),
            F.lit("}"),
        )
    )


@query(
    "variant_props_shred",
    oracle="""
    -- DuckDB twin of Spark 4's VARIANT surface: try_parse_json ==
    -- json_valid gate (an engine-NULL envelope is quarantined too,
    -- hence e IS NULL OR NOT json_valid(e)); the k extraction mirrors
    -- the variant integral-gate contract props_from_json_typed pinned:
    -- k is BIGINT only when the arriving value IS an int64 — a quoted
    -- "12", 1.5, or an out-of-int64-range number are all NULL in both
    -- engines (Spark: schema_of_variant(k) = 'BIGINT' excludes
    -- STRING/DECIMAL arrivals and DECIMAL(20,0) overflow; DuckDB:
    -- json_type in BIGINT/UBIGINT + TRY_CAST, which NULLs the
    -- above-int64 UBIGINT band) — probe-verified shape by shape.
    WITH env AS (
      SELECT event_type,
             CASE WHEN event_id % 97 = 0 THEN '{not json'
                  ELSE '{"payload": ' || props || ', "tags": ["t' || (event_id % 3)
                       || '","u' || (user_id % 5) || '"], "rank": ' || (event_id % 7) || '}'
             END AS e
      FROM events
    ), shred AS (
      SELECT event_type, (e IS NULL OR NOT json_valid(e)) AS malformed,
             CASE WHEN json_valid(e)
                   AND json_type(json(e), '$.payload.k') IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract(e, '$.payload.k') AS BIGINT) END AS k,
             CASE WHEN json_valid(e)
                  THEN json_extract_string(e, '$.tags[0]') END AS tag0,
             CASE WHEN json_valid(e)
                  THEN TRY_CAST(json_extract(e, '$.rank') AS BIGINT) END AS rank,
             -- CASE gate (not a bare AND): DuckDB does not short-circuit
             -- conjunctions, so json() must stay behind the json_valid CASE
             CASE WHEN json_valid(e)
                  THEN json_type(json(e), '$.payload.absent') IS NOT NULL
                  ELSE FALSE END AS absent_present
      FROM env
    )
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN malformed THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT tag0) AS BIGINT) AS n_tag0,
           MAX(rank) AS max_rank,
           -- path-presence count, NOT a hardcoded 0 (r11 ADVICE): a
           -- future props mutation that plants 'absent' moves BOTH
           -- engines together. Type-agnostic on purpose — the Spark
           -- side extracts the path as 'variant' (any arriving type,
           -- incl. JSON null: a variant null is a NON-NULL variant,
           -- probe-verified, and DuckDB json_type returns the non-NULL
           -- string 'NULL' there — both engines count it present).
           CAST(SUM(CASE WHEN absent_present THEN 1 ELSE 0 END) AS BIGINT) AS n_absent
    FROM shred GROUP BY event_type
    """,
    survey="T4,T6,T8 via Spark-4 VARIANT (schema-on-read without a declared schema)",
)
def variant_props_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT over the semi-structured payload: the third rung
    of the props ladder (regex probe -> from_json with a DECLARED
    schema -> VARIANT with NO declared schema). The reference probes
    event payload dicts per row with no schema contract
    (`PodioApiGateway.py:120-145` routes on whatever keys arrive);
    VARIANT is the engine-native form of that tolerance: parse once
    into a typed binary encoding, navigate paths lazily, and let
    ``schema_of_variant`` report what actually arrived.

    The envelope deterministically wraps props in one nesting level +
    an array + a sibling scalar (so path navigation ``$.payload.k``,
    array access ``$.tags[0]`` and typed casts are all exercised), and
    plants a malformed payload on every ``event_id % 97 == 0`` row:
    ``try_parse_json`` quarantines those as NULL variants instead of
    failing the batch — the same ingest-boundary posture as
    utf8_ingest_quarantine. ``try_variant_get`` on a path no row has
    proves missing-path tolerance: n_absent counts PATH PRESENCE
    (extracted as 'variant', so any arriving type counts), and the
    oracle computes the same presence count in DuckDB rather than
    hardcoding 0 — a future props mutation that plants the key moves
    both engines together (r11 ADVICE close).

    The k extraction is gated on ``schema_of_variant(k) == 'BIGINT'``
    before the typed cast: bare ``variant_get(..., 'bigint')`` THROWS
    on a non-castable arrival (a quoted "12", 1.5), and the gate pins
    the same integral-only contract as props_from_json_typed — NULL
    for string/decimal/overflow arrivals in both engines (see the
    oracle header). tag0/rank stay ungated ``variant_get``: those
    fields are engine-built by the envelope, typed by construction.
    The constant inferred-schema claim (``schema_of_variant`` over the
    whole envelope) is pinned by tests/test_spark4_surface.py rather
    than the oracle — under degenerate payloads the envelope schema is
    data-dependent, which a hash oracle must not hardcode.

    Scale: parse_json is JVM codegen (no Python, no Arrow hop); the
    variant binary encoding is ~1 byte-pass per payload, paths are
    O(depth) lookups — a single narrow scan + a 5-group partial-agg
    groupBy, the same shape at 100 TB. VARIANT shreds at the scan, so
    unlike from_json there is no per-query schema to keep in sync with
    drifting producers."""
    return (
        table(spark, sf_dir, "events")
        .select("event_type", F.try_parse_json(_props_envelope()).alias("v"))
        .select(
            "event_type",
            F.expr("variant_get(v, '$.payload.k', 'variant')").alias("kv"),
            F.expr("variant_get(v, '$.tags[0]', 'string')").alias("tag0"),
            F.expr("variant_get(v, '$.rank', 'bigint')").alias("rank"),
            # 'variant' target: presence of the path, whatever type
            # arrives (a variant null counts as present — see oracle)
            F.expr("try_variant_get(v, '$.payload.absent', 'variant')").alias("absent"),
            F.col("v").isNull().alias("malformed"),
        )
        .select(
            "event_type",
            "tag0",
            "rank",
            "absent",
            "malformed",
            F.when(
                F.schema_of_variant(F.col("kv")) == "BIGINT",
                F.expr("variant_get(kv, '$', 'bigint')"),
            ).alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("malformed").cast("bigint")).alias("n_malformed"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("tag0").alias("n_tag0"),
            F.max("rank").alias("max_rank"),
            F.count("absent").alias("n_absent"),
        )
    )
