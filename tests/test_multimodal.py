"""Multimodal plumbing tests: Arrow batch shape through mapInPandas,
binary round trip, integrity gate, and the NotImplementedError stub
for real codecs (absent in this container).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import multimodal
from crm_etl_pipeline_spark.io import table

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    return multimodal.attach_payload(table(spark, SF_DIR, "documents"))


def test_payload_binary_roundtrip(spark):
    media = _media(spark)
    assert dict(media.dtypes)["payload"] == "binary"
    back = media.select("doc_id", F.decode("payload", "UTF-8").alias("text2"))
    orig = table(spark, SF_DIR, "documents").select("doc_id", "text")
    joined = back.join(orig, "doc_id")
    assert joined.filter(F.col("text2") != F.col("text")).count() == 0


def test_integrity_gate(spark):
    media = _media(spark)
    assert media.filter(~multimodal.payload_integrity(media)).count() == 0
    corrupted = media.withColumn(
        "payload", F.concat(F.col("payload"), F.lit(b"\x00"))
    )
    assert corrupted.filter(~multimodal.payload_integrity(corrupted)).count() == corrupted.count()


def test_feature_batch_shape(spark):
    feats = multimodal.decode_features(_media(spark))
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = feats.collect()
    assert rows
    for r in rows:
        assert (r.width, r.height, r.n_channels) == multimodal.fake_image_dims(r.n_bytes)


def test_real_codec_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(_media(spark), real_codec=True)


def test_frame_offsets_cover_payload(spark):
    media = _media(spark)
    frames = multimodal.frame_offsets(media, chunk_bytes=256)
    agg = frames.groupBy("doc_id").agg(
        F.max("byte_offset").alias("last_off"), F.count(F.lit(1)).alias("n")
    )
    joined = agg.join(media.select("doc_id", F.col("meta.n_bytes").alias("nb")), "doc_id")
    # last chunk starts within the payload; one chunk per 256 bytes (+1)
    assert joined.filter(F.col("last_off") > F.col("nb")).count() == 0
    assert joined.filter(F.col("n") != (F.col("nb") / 256).cast("int") + 1).count() == 0
