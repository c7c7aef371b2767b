"""Multimodal columns (SURVEY §2.9 extensions): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, and the
decode / feature-extract / frame-sample stages a training-data
pipeline runs over them.

Spark-first design:

- a media row is ``(key, payload: binary, meta: struct<mime, n_bytes,
  checksum>)`` — the payload never deserializes JVM-side; metadata and
  integrity checks are column algebra (length / sha2 on binary);
- CPU-heavy per-item decoding is an Arrow-batched ``mapInPandas``
  stage: whole partitions stream through pandas in batches, so the
  Python boundary is crossed per-batch, not per-row. At 100 TB the
  same function runs unchanged — parallelism comes from input splits;
- frame/window sampling is pure column algebra (sequence + explode),
  no Python.

STUB NOTICE: this container has no image/audio codecs (no PIL, no
libav), so ``decode_features``' pixel-decode branch raises
NotImplementedError if a real codec is requested and otherwise uses a
clearly-marked deterministic fake (arithmetic on payload bytes). The
Spark-side plumbing — schema, Arrow batching, UDF signature, partition
behavior — is real and tested; swapping the fake for PIL is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output schema of the feature-extraction stage
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)

MIME_BY_MOD = {0: "image/png", 1: "audio/wav", 2: "video/mp4"}


def attach_payload(docs: DataFrame) -> DataFrame:
    """Fabricate the media table from the documents fixture: the utf-8
    bytes stand in for real image/audio payloads (same opaque-binary
    handling), mime assigned deterministically by key."""
    payload = F.encode(F.col("text"), "UTF-8")
    mime = F.element_at(
        F.array(*[F.lit(m) for m in MIME_BY_MOD.values()]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("checksum"),
        ).alias("meta"),
    )


def fake_image_dims(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic FAKE decode (see stub notice): pretend dimensions
    derived from payload size. Replace with PIL.Image.open for real
    pixels."""
    return n_bytes % 640 + 16, n_bytes % 480 + 16, n_bytes % 3 + 1


def decode_features(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each pandas batch carries the payload bytes;
    per-batch vectorized work replaces per-row Python. The fake decode
    keeps the full batch shape of a real one.
    """
    if real_codec:
        raise NotImplementedError(
            "no image/audio codecs in this environment (PIL/libav absent); "
            "wire the real decoder here when available"
        )

    flat = media.select(
        "doc_id", F.col("meta.mime").alias("mime"), F.col("payload")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes.astype("int32"),
                    "width": (n_bytes % 640 + 16).astype("int32"),
                    "height": (n_bytes % 480 + 16).astype("int32"),
                    "n_channels": (n_bytes % 3 + 1).astype("int32"),
                }
            )

    return flat.mapInPandas(extract, FEATURE_SCHEMA)


def frame_offsets(media: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Frame/window sampling plan: one row per fixed-size chunk of the
    payload — sequence + posexplode column algebra, no Python. The real
    pipeline seeks these offsets inside the codec stage."""
    # explicit floor division: DuckDB's double→int CAST rounds while
    # Spark's truncates, so the oracle must see the same floor
    n_frames = F.floor(F.col("meta.n_bytes") / chunk_bytes).cast("int") + 1
    return media.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select(
        "doc_id",
        "mime",
        "frame_idx",
        (F.col("frame_idx") * chunk_bytes).alias("byte_offset"),
    )


def payload_integrity(media: DataFrame) -> Column:
    """Integrity predicate: stored checksum matches the payload —
    the cheap corruption gate before any decode work."""
    return F.sha2(F.col("payload"), 256) == F.col("meta.checksum")
