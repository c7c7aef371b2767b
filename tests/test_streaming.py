"""Streaming convergence tests (SURVEY §5.3): the availableNow replay
of the event stream must land in exactly the state the batch pipeline
computes from the same input — at-least-once + idempotent merge ⇒
exactly-once effect — and the DLQ must populate at the threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crm_etl_pipeline_spark import scd, streaming

SF_DIR = "/root/testdata/sf0.001"

_COLS = ["item_id", "event_id", "ts", "value", "version", "is_current"]


def test_streaming_converges_to_batch_state(spark, tmp_path):
    paths = streaming.run_pipeline(spark, SF_DIR, workdir=str(tmp_path))
    streamed = scd.read_store(spark, paths["store"]).select(*_COLS)
    batch = streaming.batch_equivalent_state(spark, SF_DIR).select(*_COLS)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_completed_queue_and_dlq(spark, tmp_path):
    paths = streaming.run_pipeline(spark, SF_DIR, workdir=str(tmp_path))
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_process = events.filter(F.col("event_type").isin(*streaming.PROCESS_TYPES)).count()
    completed = spark.read.parquet(paths["completed"])
    assert completed.count() == n_process
    assert "completed_timestamp" in completed.columns
    n_dlq_expected = events.filter(
        (F.col("event_type") == "error")
        & (F.floor(F.col("value")).cast("int") % 12 + 1 >= streaming.DLQ_THRESHOLD)
    ).count()
    assert spark.read.parquet(paths["dlq"]).count() == n_dlq_expected


def test_windowed_counts_match_batch(spark, tmp_path):
    out = str(tmp_path / "counts")
    streaming.windowed_counts_stream(spark, SF_DIR, out)
    streamed = spark.read.parquet(out)
    from crm_etl_pipeline_spark.registry import load_all

    batch = load_all()["tumbling_daily_counts"].fn(spark, SF_DIR)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_batch_dedup_last_write_wins(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    deduped = streaming.dedup_last_write_wins(events)
    per_key = deduped.groupBy("user_id", "event_type").count()
    assert per_key.filter(F.col("count") > 1).count() == 0


def test_session_windows_stream_matches_batch(spark, tmp_path):
    """The declarative session_window query produces the identical
    session table whether run as a batch DataFrame or as a watermarked
    stream drained with availableNow."""
    out = str(tmp_path / "sessions")
    streaming.session_windows_stream(spark, SF_DIR, out)
    streamed = spark.read.parquet(out)
    from crm_etl_pipeline_spark.registry import load_all

    batch = load_all()["session_window_builtin"].fn(spark, SF_DIR)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Doubling the stream then dropDuplicatesWithinWatermark yields
    exactly the original event set."""
    out = str(tmp_path / "deduped")
    streaming.dedup_stream_within_watermark(spark, SF_DIR, out)
    got = spark.read.parquet(out)
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert got.count() == src.count()
    assert got.select("event_id").distinct().count() == src.count()
