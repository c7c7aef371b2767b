"""SCD Type-2 versioned store: the write half of the reference's load
path, Spark-first.

Reference parity: on each processed event the reference flips every
prior version of the item to ``current: 0`` and inserts the new decode
with ``current: 1`` (`PodioApiGateway.py:132-137`), appends the event
to the completed queue (`PodioApiGateway.py:139-141`), and has a
drafted soft-delete that marks the latest version ``deleted: True``
without removing history (`PodioApiGateway.py:161-178`).

Plain parquet has no MERGE, so the engine offers the two standard
strategies:

- **merge-on-read** (`scd2_apply` + `current_view`): the store is an
  append-only union of versions; ``current`` is derived by a
  row_number window at read time. Writes are cheap appends (no
  rewrite); the window partitions by the item key — high cardinality,
  so it scales.
- **rewrite-on-write** (`write_store` / `read_store`): materialize the
  computed flags and partition the files by ``is_current``, so the hot
  "current view" read prunes to the current=true files only — at
  100 TB that's the difference between scanning every version ever
  written and scanning one generation.

At-scale notes: the apply window shuffles once on the item key; a
single mega-hot key (millions of versions of one item) would skew —
that is a data bug upstream, not a partitioning concern, since CRM
items have bounded update rates. ``mode("append")`` on the completed
queue matches the reference's insert-only queue semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: system columns every version row carries (FIXTURES.md §1 decoded row)
KEY_COL = "item_id"
TS_COL = "ts"
SEQ_COL = "event_id"  # deterministic tiebreaker within equal timestamps


def scd2_apply(store: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Merge a batch of new versions into the versioned store.

    ``store`` is the existing version table (or None for bootstrap);
    ``updates`` carries one row per new version with the same schema
    minus the derived columns. Both get ``version`` (1 = oldest) and
    ``is_current`` recomputed — the declarative equivalent of the
    reference's update_many(current:0) + insert(current:1)
    (`PodioApiGateway.py:132-137`). Idempotent: applying the same batch
    twice yields the same flags (duplicates collapse on the
    (key, ts, seq) identity first).

    Identity collapse is a deterministic MIN winner, not
    dropDuplicates (round-10 id_collision_customer probe): a subset
    dropDuplicates picks an ARBITRARY survivor among same-identity-
    DIFFERENT-payload rows — exactly the coin flip a collided base
    load produces (two base rows share (item_id, BASE_TS, 0) with
    different values, and no tiebreaker can order them). Per-payload-
    column MIN is the same shuffle the dropDuplicates already paid
    (hash aggregate on the identity key), collapses byte-identical
    at-least-once re-deliveries to the identical row (round-8
    contract, unchanged), and resolves a collided identity to the
    column-wise smallest payload — mirrored by MIN(value) GROUP BY
    identity in the oracles' all_v CTE. Column-wise (not struct MIN)
    because payload columns can be NULL and struct MIN with a NULL
    field diverges cross-engine (llmops._one_per_doc's documented
    hazard); for multi-column payloads the winner is therefore
    resolved per column.
    """
    bare = updates.select(*_bare_cols(updates))
    if store is not None:
        bare = store.select(*_bare_cols(store)).unionByName(bare)
    ident = [KEY_COL, TS_COL, SEQ_COL]
    payload = [c for c in bare.columns if c not in ident]
    bare = bare.groupBy(*ident).agg(*[F.min(c).alias(c) for c in payload])
    w_asc = Window.partitionBy(KEY_COL).orderBy(F.col(TS_COL), F.col(SEQ_COL))
    w_desc = Window.partitionBy(KEY_COL).orderBy(F.col(TS_COL).desc(), F.col(SEQ_COL).desc())
    return bare.withColumn("version", F.row_number().over(w_asc)).withColumn(
        "is_current", F.row_number().over(w_desc) == 1
    )


def _bare_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in ("version", "is_current")]


def expire_versions(store: DataFrame, horizon: str) -> DataFrame:
    """Snapshot expiry / retention GC over the version log: reclaim
    every version that NO time-travel read at or after ``horizon`` can
    surface. A version is visible at instant t iff it is the newest
    row with ts <= t; once its successor's ts has passed the horizon,
    no t >= horizon ever selects it again — so the reclaim rule is
    exactly "drop rows whose successor ts <= horizon". Current rows
    (no successor) always survive; so does the version that was live
    AT the horizon, keeping ``asof_view(store, t)`` bit-identical on
    the expired store for every t >= horizon (tests pin this). Version
    numbers keep their historical values, so expiry leaves gaps in the
    sequence — the audit trail that GC happened, same as snapshot ids
    in any table format.

    This is the WAP/time-travel family's missing GC half: the
    append-only log otherwise keeps every version forever, and a real
    100 TB store reclaims — the reference's `podio_items` collection
    has the same unbounded growth (`PodioApiGateway.py:131-137`).

    Scale shape: one lead() window over the same item_id partitioning
    every store read already pays, then a filter — the reclaim is
    O(history) with no extra shuffle, and on the is_current-partitioned
    layout the rewrite touches only is_current=false files."""
    w = Window.partitionBy(KEY_COL).orderBy(F.col(TS_COL), F.col(SEQ_COL))
    return (
        store.withColumn("_nxt", F.lead(TS_COL).over(w))
        .filter(
            F.col("_nxt").isNull()
            | (F.col("_nxt") > F.lit(horizon).cast("timestamp"))
        )
        .drop("_nxt")
    )


def current_view(store: DataFrame) -> DataFrame:
    """Latest version per key (`PodioApiGateway.py:165` sort-desc
    find_one, table-wide). On a store written by ``write_store`` this
    filter is a partition predicate — only current=true files scan."""
    return store.filter(F.col("is_current"))


def soft_delete(store: DataFrame, delete_keys: DataFrame) -> DataFrame:
    """Mark the current version of each key in ``delete_keys`` as
    deleted without dropping history (`PodioApiGateway.py:166-169`).
    ``delete_keys`` must have (item_id, delete_ts) — one row per key.
    No broadcast hint: a replay-sized delete set is key-scaled, so AQE
    picks broadcast only when the batch is genuinely small.
    """
    marked = store.join(delete_keys, KEY_COL, "left")
    return marked.withColumn(
        "deleted", F.col("is_current") & F.col("delete_ts").isNotNull()
    )


def write_store(store: DataFrame, path: str) -> None:
    """Rewrite-on-write materialization, partitioned by ``is_current``
    so the current view prunes to one generation of files."""
    store.write.mode("overwrite").partitionBy("is_current").parquet(path)


def append_completed(events: DataFrame, path: str) -> None:
    """Append processed events to the completed queue
    (`PodioApiGateway.py:139-141`): insert-only parquet append."""
    events.withColumn("completed_timestamp", F.current_timestamp()).write.mode(
        "append"
    ).parquet(path)


def read_store(spark, path: str) -> DataFrame:
    """Read a write_store layout back. Partition-column values come
    back as strings (Spark's partition type inference has no boolean
    case), so restore ``is_current`` to its logical type."""
    df = spark.read.parquet(path)
    return df.withColumn("is_current", F.col("is_current").cast("boolean"))


def asof_view(store: DataFrame, as_of: str) -> DataFrame:
    """Time travel: the state of every key as of ``as_of`` — the
    version that was current at that instant (latest version with
    ts <= as_of; keys born later vanish). The stored ``version``
    column already equals the rank among versions at-or-before any
    cut, because versions are (ts, event_id)-ordered — so the as-of
    read is a filter plus one partitioned window head, O(history ≤ T)
    with the same WindowGroupLimit prune as ``current_view``'s twin
    queries, and no store rewrite ever happens for it (the log is
    append-only; every historical state stays addressable)."""
    cut = store.filter(F.col(TS_COL) <= F.lit(as_of).cast("timestamp"))
    w = Window.partitionBy(KEY_COL).orderBy(F.col(TS_COL).desc(), F.col(SEQ_COL).desc())
    return (
        cut.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
