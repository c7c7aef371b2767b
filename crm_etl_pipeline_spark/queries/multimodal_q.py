"""Driver-visible multimodal queries (SURVEY §2.9): binary payload
manifest, Arrow-batched feature extraction, and frame sampling. The
fake decode is deterministic arithmetic on payload size, so even the
mapInPandas stage is fully oracle-checked — the oracle recomputes the
same features from octet_length without ever seeing the binary path.
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
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
           CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS n_channels
    FROM documents
    """,
    survey="§2.9 multimodal (Arrow-batched mapInPandas feature extraction; stubbed decode)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the real mapInPandas plumbing (Arrow
    batches of binary payloads into pandas); the deterministic fake
    decode makes the Python stage oracle-verifiable end-to-end."""
    return multimodal.decode_features(_media(spark, sf_dir)).select(
        "doc_id", "n_bytes", "width", "height", "n_channels"
    )


@query(
    "multimodal_real_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'audio/wav' ELSE 'image/bmp' END AS mime,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 44 + (100 + doc_id % 500) * (1 + (doc_id % 4) // 2) * 2
                ELSE 54 + ((3 * (16 + doc_id % 32) + 3) // 4 * 4) * (16 + (7 * doc_id) % 32)
                END AS INT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 32 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + (7 * doc_id) % 32 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + (doc_id % 4) // 2 ELSE 3 END AS INT)
             AS n_channels,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 END AS INT) AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 100 + doc_id % 500 END AS INT) AS n_samples,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS INT) AS bit_depth
    FROM documents
    """,
    survey="§2.9 multimodal (REAL WAV/BMP container decode over fabricated real bytes)",
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode(fabricate(doc_id)) recovers the fabrication parameters:
    genuine RIFF/WAVE and BMP byte streams are built per doc, then the
    decoder parses the actual container headers (RIFF chunk walk /
    BITMAPINFOHEADER) inside Arrow-batched mapInPandas. The oracle
    recomputes the parameters closed-form from doc_id — any header-
    layout bug in fabricator OR parser breaks the match. mp4 remains
    honestly stubbed (needs libav); this proves the real-codec path
    end-to-end for formats pure Python can parse."""
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
