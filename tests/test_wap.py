"""Write-audit-publish failure paths: the happy path is oracle-checked
by the wap_publish_roundtrip registry query; these prove the gates —
a rejected batch never becomes visible, rollback is metadata-only, and
versions are retained."""

from __future__ import annotations

from pyspark.sql import functions as F

from crm_etl_pipeline_spark import wap


def _events(spark, n=100):
    return (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .filter(F.col("event_id") < n)
    )


def test_rejected_batch_leaves_old_version_live(spark, tmp_path):
    root = str(tmp_path / "t")
    ok, v1, _ = wap.publish(spark, _events(spark, 100), root)
    assert ok and v1 == 1

    bad = _events(spark, 200).withColumn(
        "event_id", F.when(F.col("event_id") < 50, None).otherwise(F.col("event_id"))
    )
    ok, v, failures = wap.publish(
        spark,
        bad,
        root,
        audits=[
            (
                "event_id_not_null",
                lambda d: (
                    d.filter(F.col("event_id").isNull()).count() == 0,
                    "null event_id",
                ),
            )
        ],
    )
    assert not ok and v is None and failures
    # reader still resolves version 1, bit-for-bit
    assert wap.current_version(root) == 1
    assert wap.read_published(spark, root).count() == _events(spark, 100).count()
    # the rejected bytes are quarantined for forensics, not deleted
    assert (tmp_path / "t" / "_rejected" / "v2").is_dir()


def test_rollback_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "t")
    wap.publish(spark, _events(spark, 100), root)
    ok, v2, _ = wap.publish(spark, _events(spark, 200), root)
    assert ok and v2 == 2
    assert wap.read_published(spark, root).count() == _events(spark, 200).count()

    wap.rollback(root, 1)
    assert wap.current_version(root) == 1
    assert wap.read_published(spark, root).count() == _events(spark, 100).count()
    # both versions' data files remain on disk (retention enables rollback)
    assert (tmp_path / "t" / "v1").is_dir() and (tmp_path / "t" / "v2").is_dir()


def test_rollback_to_unpublished_version_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    wap.publish(spark, _events(spark, 100), root)
    import pytest

    with pytest.raises(FileNotFoundError):
        wap.rollback(root, 7)
