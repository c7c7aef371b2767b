"""Driver-visible multimodal queries (SURVEY §2.9): binary payload
manifest, Arrow-batched REAL feature extraction (WAV/BMP/PNG/MP4
container decode), and frame sampling. Fabrication parameters are closed-form in
doc_id, so even the mapInPandas decode stage is fully oracle-checked —
the oracle recomputes every feature from doc_id without ever seeing
the binary path; a bug in fabricator or parser breaks the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crm_etl_pipeline_spark import multimodal
from crm_etl_pipeline_spark.io import table
from crm_etl_pipeline_spark.registry import query

_MIME_SQL = "['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1]"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.attach_payload(table(spark, sf_dir, "documents"))


@query(
    "multimodal_manifest",
    oracle=f"""
    SELECT doc_id,
           {_MIME_SQL} AS mime,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS checksum,
           TRUE AS integrity_ok
    FROM documents
    """,
    survey="§2.9 multimodal (binary payload + typed metadata + integrity gate)",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media manifest: opaque binary payload, typed metadata, and
    the checksum integrity predicate — all JVM-side column algebra on
    BinaryType (payload bytes are never deserialized)."""
    media = _media(spark, sf_dir)
    return media.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        multimodal.payload_integrity(media).alias("integrity_ok"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'audio/wav'
                WHEN 1 THEN 'image/bmp' WHEN 2 THEN 'image/png'
                ELSE 'video/mp4' END AS mime,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 44 + (100 + doc_id % 500) * (1 + (doc_id // 4) % 2) * 2
                WHEN 1 THEN 54 + ((3 * (16 + doc_id % 32) + 3) // 4 * 4)
                            * (16 + (7 * doc_id) % 32)
                WHEN 2 THEN 68 + (16 + (11 * doc_id) % 32) * (1 + 3 * (16 + doc_id % 32))
                ELSE 352 + doc_id % 128
                END AS INT) AS n_bytes,
           CAST(CASE WHEN doc_id % 4 <> 0 THEN 16 + doc_id % 32 END AS INT) AS width,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 1 THEN 16 + (7 * doc_id) % 32
                WHEN 2 THEN 16 + (11 * doc_id) % 32
                WHEN 3 THEN 16 + (13 * doc_id) % 32 END AS INT) AS height,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 1 + (doc_id // 4) % 2
                WHEN 1 THEN 3 WHEN 2 THEN 3 END AS INT) AS n_channels
    FROM documents
    """,
    survey="§2.9 multimodal (Arrow-batched mapInPandas feature extraction over REAL decode)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the real mapInPandas plumbing (Arrow
    batches of binary payloads into pandas): the REAL container decode
    projected to feature columns — audio rows carry channel count with
    null dimensions, image rows carry width/height/channels, video rows
    carry track dimensions with null channels. The oracle recomputes
    every feature closed-form from doc_id, so a bug in fabricator or
    parser breaks the match (all four containers decode for real)."""
    docs = table(spark, sf_dir, "documents")
    return multimodal.decode_features(multimodal.fabricate_media(docs))


@query(
    "multimodal_real_decode",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'audio/wav'
                WHEN 1 THEN 'image/bmp' WHEN 2 THEN 'image/png'
                ELSE 'video/mp4' END AS mime,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 44 + (100 + doc_id % 500) * (1 + (doc_id // 4) % 2) * 2
                WHEN 1 THEN 54 + ((3 * (16 + doc_id % 32) + 3) // 4 * 4)
                            * (16 + (7 * doc_id) % 32)
                WHEN 2 THEN 68 + (16 + (11 * doc_id) % 32) * (1 + 3 * (16 + doc_id % 32))
                ELSE 352 + doc_id % 128
                END AS INT) AS n_bytes,
           CAST(CASE WHEN doc_id % 4 <> 0 THEN 16 + doc_id % 32 END AS INT) AS width,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 1 THEN 16 + (7 * doc_id) % 32
                WHEN 2 THEN 16 + (11 * doc_id) % 32
                WHEN 3 THEN 16 + (13 * doc_id) % 32 END AS INT) AS height,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 1 + (doc_id // 4) % 2
                WHEN 1 THEN 3 WHEN 2 THEN 3 END AS INT) AS n_channels,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 8000 WHEN 3 THEN 90000 END AS INT) AS sample_rate,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 100 + doc_id % 500
                WHEN 3 THEN 1000 + doc_id % 9000 END AS INT) AS n_samples,
           CAST(CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 8 END AS INT) AS bit_depth
    FROM documents
    """,
    survey="§2.9 multimodal (REAL WAV/BMP/PNG/MP4 container decode over fabricated real bytes)",
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode(fabricate(doc_id)) recovers the fabrication parameters:
    genuine RIFF/WAVE, BMP, PNG, and ISO-BMFF byte streams are built
    per doc, then the decoder parses the actual containers (RIFF chunk
    walk, BITMAPINFOHEADER, PNG chunk walk + CRC verify + zlib inflate
    + scanline check, MP4 box-tree walk → mvhd timescale/duration +
    tkhd 16.16 dims) inside Arrow-batched mapInPandas. The oracle
    recomputes the parameters closed-form from doc_id — any layout bug
    in fabricator OR parser breaks the match (the PNG file size is
    closed-form because the IDAT zlib stream uses stored blocks, the
    MP4's because every header box is fixed-size; see
    multimodal._png_bytes/_mp4_bytes). No codec stubs remain."""
    media = multimodal.fabricate_media(table(spark, sf_dir, "documents"))
    return multimodal.decode_media(media)


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i AS INT) * 256 AS byte_offset
    FROM documents,
         unnest(range(0, CAST(FLOOR(octet_length(encode(text)) / 256) AS INT) + 1)) t(i)
    """,
    survey="§2.9 multimodal (frame/window sampling as sequence+explode column algebra)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload frame plan: one row per 256-byte chunk — the sample
    grid a codec stage would seek through, generated without Python."""
    return multimodal.frame_offsets(_media(spark, sf_dir)).select(
        "doc_id", "frame_idx", "byte_offset"
    )
