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


def test_publish_after_rollback_skips_retained_version(spark, tmp_path):
    """The docstring's advertised rollback-then-continue: after
    rollback(1) the manifest reads 1 but v2 is retained on disk, so the
    next publish must allocate v3 (the manifest pointer is not the
    version allocator) instead of colliding with the retained v2."""
    root = str(tmp_path / "t")
    wap.publish(spark, _events(spark, 100), root)
    ok, v2, _ = wap.publish(spark, _events(spark, 200), root)
    assert ok and v2 == 2
    wap.rollback(root, 1)

    ok, v3, _ = wap.publish(spark, _events(spark, 300), root)
    assert ok and v3 == 3
    assert wap.current_version(root) == 3
    assert wap.read_published(spark, root).count() == _events(spark, 300).count()
    # every version is still rollback-able
    for v in (1, 2, 3):
        assert (tmp_path / "t" / f"v{v}").is_dir()


def test_consecutive_rejections_get_distinct_versions(spark, tmp_path):
    """Two audit-rejected publishes in a row must quarantine under
    DIFFERENT _rejected/vN dirs with separate forensics reports — the
    second must not nest inside (or overwrite the report of) the first."""
    root = str(tmp_path / "t")
    wap.publish(spark, _events(spark, 100), root)
    always_fail = [("nope", lambda d: (False, "rejected by policy"))]

    ok1, _, f1 = wap.publish(spark, _events(spark, 150), root, audits=always_fail)
    ok2, _, f2 = wap.publish(spark, _events(spark, 200), root, audits=always_fail)
    assert not ok1 and not ok2 and f1 and f2

    rej = tmp_path / "t" / "_rejected"
    assert (rej / "v2").is_dir() and (rej / "v3").is_dir()
    # no nesting: v3 sits beside v2, not inside it
    assert not (rej / "v2" / "v3").exists()
    # both forensics reports survive
    assert (rej / "v2.audit_failures.json").is_file()
    assert (rej / "v3.audit_failures.json").is_file()
    # a subsequent GOOD publish continues past the rejected numbers
    ok, v4, _ = wap.publish(spark, _events(spark, 250), root)
    assert ok and v4 == 4 and wap.current_version(root) == 4
