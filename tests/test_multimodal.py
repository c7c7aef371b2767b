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


def test_fabricated_wav_opens_with_stdlib():
    """The fabricated payloads are REAL media files: the standard
    library's wave module (an independent RIFF parser) must open them
    and report the same parameters our decoder extracts."""
    import io
    import wave

    from crm_etl_pipeline_spark import multimodal

    for doc_id in (0, 2, 4, 6, 100, 498):
        with wave.open(io.BytesIO(multimodal._wav_bytes(doc_id))) as w:
            assert w.getnchannels() == 1 + (doc_id % 4) // 2
            assert w.getframerate() == multimodal.WAV_RATE
            assert w.getsampwidth() == multimodal.WAV_BITS // 8
            assert w.getnframes() == 100 + doc_id % 500


def test_fabricated_bmp_header_is_valid():
    """BMP sanity independent of our parser: magic, declared file size
    equals actual length, pixel offset 54, positive dims, 24 bpp."""
    import struct

    from crm_etl_pipeline_spark import multimodal

    for doc_id in (1, 3, 5, 31, 99, 499):
        b = multimodal._bmp_bytes(doc_id)
        assert b[:2] == b"BM"
        size, _, _, offset = struct.unpack_from("<IHHI", b, 2)
        assert size == len(b) and offset == 54
        w, h = struct.unpack_from("<ii", b, 18)
        assert w == 16 + doc_id % 32 and h == 16 + (7 * doc_id) % 32
        assert struct.unpack_from("<H", b, 28)[0] == 24
        stride = (3 * w + 3) // 4 * 4
        assert len(b) == 54 + stride * h
