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

Codec status: WAV (RIFF/PCM) and BMP are decoded FOR REAL —
``fabricate_media`` emits genuine RIFF/BMP byte streams and
``decode_media`` parses the actual container headers (chunk walk /
fixed-offset header), with a closed-form DuckDB oracle proving
decode(fabricate(x)) recovers the parameters
(queries/multimodal_q.py:multimodal_real_decode). Formats that need
external codecs (mp4 — no libav in this container) remain stubbed:
``decode_features``' real_codec branch raises NotImplementedError and
the fake branch is clearly marked. The Spark-side plumbing — schema,
Arrow batching, UDF signature, partition behavior — is identical for
real and stubbed formats.
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


# ---------------------------------------------------------------------------
# real codecs: WAV (RIFF/PCM) + BMP — pure-Python container parsing, no
# external libraries. Fabrication parameters are closed-form in doc_id so a
# SQL oracle can verify that decoding the real bytes recovers them.

WAV_RATE = 8000
WAV_BITS = 16
BMP_BPP = 24

#: decode output schema (wav rows: width/height null; bmp rows:
#: sample_rate/n_samples null)
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("bit_depth", IntegerType()),
    ]
)

_FAB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _wav_bytes(doc_id: int) -> bytes:
    """A complete, valid RIFF/WAVE PCM file. Parameters are closed-form
    in doc_id (the oracle recomputes them): channels = 1 + (doc_id % 4)/2
    (mono/stereo both exercised on even ids), n_samples =
    100 + doc_id % 500, rate 8000 Hz, 16-bit."""
    import struct

    n_ch = 1 + (doc_id % 4) // 2
    n_samples = 100 + doc_id % 500
    block_align = n_ch * WAV_BITS // 8
    data_size = n_samples * block_align
    samples = bytearray()
    for i in range(n_samples * n_ch):
        samples += struct.pack("<h", (doc_id * 31 + i * 7) % 65536 - 32768)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_ch, WAV_RATE, WAV_RATE * block_align, block_align, WAV_BITS
        )
        + b"data"
        + struct.pack("<I", data_size)
        + bytes(samples)
    )


def _bmp_bytes(doc_id: int) -> bytes:
    """A complete, valid 24-bit BMP (BITMAPINFOHEADER). width =
    16 + doc_id % 32, height = 16 + (7 * doc_id) % 32."""
    import struct

    w = 16 + doc_id % 32
    h = 16 + (7 * doc_id) % 32
    stride = (3 * w + 3) // 4 * 4  # rows pad to 4 bytes
    img_size = stride * h
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, BMP_BPP, 0, img_size, 2835, 2835, 0, 0)
    )
    pixels = bytes((doc_id + i) % 256 for i in range(img_size))
    return header + pixels


def fabricate_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL media bytes per doc: even doc_ids get a PCM WAV,
    odd get a 24-bit BMP. mapInPandas because binary packing is not
    column algebra — this is the fixture generator, not the hot path."""
    flat = docs.select("doc_id")

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mime": ["audio/wav" if i % 2 == 0 else "image/bmp" for i in ids],
                    "payload": [
                        _wav_bytes(int(i)) if i % 2 == 0 else _bmp_bytes(int(i)) for i in ids
                    ],
                }
            )

    return flat.mapInPandas(build, _FAB_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode of the binary payloads: walks RIFF chunks for WAV
    (never assumes the canonical 44-byte layout), reads the
    BITMAPINFOHEADER for BMP. Arrow-batched mapInPandas — the payload
    crosses to Python per batch; header parsing is O(1) per item.
    Parity anchor: the reference treats attachments as opaque passthrough
    (`PodioApiWrapper.py` has no media decode) — this is the §2.9
    multimodal extension."""

    def extract(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        def parse_wav(b: bytes):
            assert b[:4] == b"RIFF" and b[8:12] == b"WAVE", "not a RIFF/WAVE stream"
            pos, n_ch, rate, bits, data_size = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
                if cid == b"fmt ":
                    _, n_ch, rate, _, block, bits = struct.unpack_from("<HHIIHH", b, pos + 8)
                elif cid == b"data":
                    data_size = size
                pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
            n_samples = data_size // (n_ch * bits // 8)
            return n_ch, rate, bits, n_samples

        def parse_bmp(b: bytes):
            assert b[:2] == b"BM", "not a BMP stream"
            w, h = struct.unpack_from("<ii", b, 18)
            bpp = struct.unpack_from("<H", b, 28)[0]
            return w, abs(h), bpp

        for pdf in batches:
            rows = []
            for doc_id, mime, payload in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                b = bytes(payload)
                if mime == "audio/wav":
                    n_ch, rate, bits, n_samples = parse_wav(b)
                    rows.append((doc_id, mime, len(b), None, None, n_ch, rate, n_samples, bits))
                else:
                    w, h, bpp = parse_bmp(b)
                    rows.append((doc_id, mime, len(b), w, h, 3, None, None, bpp))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(extract, MEDIA_SCHEMA)


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
