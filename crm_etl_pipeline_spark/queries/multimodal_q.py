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
                ELSE CASE WHEN doc_id % 8 = 7 THEN 576 + 8 * (doc_id % 16)
                          ELSE 516 + 8 * (doc_id % 16) END
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
                ELSE CASE WHEN doc_id % 8 = 7 THEN 576 + 8 * (doc_id % 16)
                          ELSE 516 + 8 * (doc_id % 16) END
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
    MP4's because every header box is fixed-size — 516 + 8·(doc_id%16)
    bytes single-chunk, 576 + 8·(doc_id%16) for the multi-chunk stsc
    variant every mp4 doc_id % 8 == 7 gets; see
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


@query(
    "multimodal_mp4_seek_plan",
    oracle="""
    SELECT doc_id,
           CAST(i AS INT) AS sample_idx,
           CAST(CASE
                WHEN doc_id % 8 = 7 AND i >= 5
                THEN 496 + 5 * (8 + doc_id % 16) + 16 + (i - 5) * (8 + doc_id % 16)
                WHEN doc_id % 8 = 7
                THEN 496 + i * (8 + doc_id % 16)
                ELSE 452 + i * (8 + doc_id % 16)
                END AS BIGINT) AS byte_offset,
           CAST(8 + doc_id % 16 AS INT) AS sample_size,
           i IN (0, 4) AS is_sync,
           CAST((i - doc_id % 3) * ((1000 + doc_id % 9000) // 8) AS BIGINT)
             AS pt_ticks,
           i >= doc_id % 3 AS presented
    FROM documents, unnest(range(0, 8)) t(i)
    WHERE doc_id % 4 = 3
    """,
    survey="§2.9 multimodal (MP4 per-sample seek plan from the genuine stsz/stsc/stco/stts sample table + the elst edit list, incl. the multi-chunk run-length walk)",
)
def multimodal_mp4_seek_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The container-driven range-read plan for video at scale: parse
    the KB-sized moov sample table, emit one row per sample with its
    exact byte range in the multi-GB mdat — the stage that lets a
    frame-sampler fetch only wanted samples. Covers BOTH fabricated
    layouts: single-chunk docs (mp4 doc_id % 8 == 3) lay samples
    back-to-back from byte 452 (MP4_CHUNK_OFFSET — the stss and elst
    additions moved the data start); multi-chunk docs (doc_id % 8 == 7)
    follow the genuine stsc run-length map (5 samples in chunk 1, 3 in
    chunk 2) across two stco bases separated by a 16-byte unreferenced
    gap — offsets a cumulative-size walk CANNOT produce, so the hash
    certifies the run-length walk itself. The oracle recomputes every
    (offset, size) closed-form from doc_id: chunk 2's base is
    496 + 5·size + 16 (five chunk-1 samples plus the gap), and the
    stss walk yields is_sync exactly on samples 1 and 5 (1-based) —
    the keyframe-only plan is ``WHERE is_sync``.

    Round-9 addition — the edit-list presentation view: each trak
    carries a genuine single-entry elst trimming (doc_id % 3) sample
    durations off the presentation start (the encoder-priming shape),
    and the walk crosses it with the stts decode times: pt_ticks =
    decode_time − media_time (negative on trimmed pre-roll) and
    presented = the sample survives the trim — closed-form
    (i − doc_id % 3)·delta with delta = duration // 8, so the hash
    certifies the stts expansion AND the edit arithmetic. The
    fetch-plan reading: a player seeking to presentation 0 still
    range-reads the pre-roll samples (they are in the plan, flagged),
    but a thumbnailer samples only ``WHERE presented AND is_sync``.
    Arrow-batched mapInPandas over binary payloads, non-MP4 rows
    filtered JVM-side before Python."""
    # Round-15: same mime-predicate pushdown as audio_energy_windows —
    # only MP4 docs (Python int(i) % 4 == 3 ≡ pmod 3) reach the
    # fabricator, so 3/4 of the payload bytes never cross the Python
    # boundary (guide §4.1). Local wall unchanged (the MP4 walk
    # dominates); the cut is Arrow traffic + wasted builder CPU.
    media = multimodal.fabricate_media(
        table(spark, sf_dir, "documents").filter(F.pmod(F.col("doc_id"), F.lit(4)) == 3)
    )
    return multimodal.mp4_sample_offsets(media).select(
        "doc_id",
        "sample_idx",
        "byte_offset",
        "sample_size",
        "is_sync",
        "pt_ticks",
        "presented",
    )


@query(
    "multimodal_byte_dedup",
    oracle="""
    WITH ids AS (
      -- doc_id is the document identity: a byte-identical re-ingested
      -- row is the same document, not a second copy (round-8 dup_docs
      -- sweep contract; mirrors the Spark side's distinct())
      SELECT DISTINCT doc_id FROM documents
    ), corpus AS (
      SELECT doc_id AS real_id, doc_id AS canon FROM ids
      UNION ALL
      SELECT doc_id + 100000 AS real_id, doc_id AS canon
      FROM ids WHERE doc_id % 6 = 0
    ), keyed AS (
      SELECT real_id,
             CASE CAST(canon % 4 AS INT)
                  WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'image/bmp'
                  WHEN 2 THEN 'image/png' ELSE 'video/mp4' END AS mime,
             CASE WHEN CAST(canon % 4 AS INT) IN (1, 2)
                  THEN canon % 256 ELSE canon END AS grp
      FROM corpus
    )
    SELECT mime, MIN(real_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM keyed GROUP BY mime, grp
    """,
    survey="§2.9 multimodal (bytewise media dedup: sha256 over BinaryType, stage 1 of image/audio dedup)",
)
def multimodal_byte_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bytewise dedup of media payloads — the cheap first pass every
    multimodal pipeline runs before perceptual hashing: sha256 over the
    binary column, hash-groupBy, keep the lowest doc_id. Duplicates
    come from two honest sources: planted clones (every doc_id % 6 == 0
    re-appears at +100000 sharing the SAME payload bytes), and the
    fabricators' own periodicity — BMP and PNG bytes are fully
    determined by doc_id mod 256 (pixel bytes, dims mod 32, and hence
    stride/length all recur), so ids 256 apart carry byte-identical
    images, exactly like thumbnail boilerplate recurring across a crawl.
    WAV and MP4 periods (lcm 8.19M / 288k) exceed any fixture range, so
    they dedup only via clones — the oracle states that closed form
    per mime. The hash group key is dropped from the output: DuckDB
    cannot fabricate the bytes, and the (mime, keep, count) triple pins
    the grouping regardless.

    Scale shape: one sha256 per payload (JVM expression over
    BinaryType, no Python), one map-side-combinable groupBy on the
    uniform 64-hex key; the clone join broadcasts nothing and reuses
    the fabrication output — O(corpus) end to end."""
    # distinct: doc_id is the document identity — a duplicated ingest
    # row must not double-fabricate (and then join-explode) its payload
    # (round-8 dup_docs sweep contract)
    docs = table(spark, sf_dir, "documents").select("doc_id").distinct()
    base_media = multimodal.fabricate_media(docs).withColumnRenamed("doc_id", "canon")
    base = docs.select(F.col("doc_id").alias("real_id"), F.col("doc_id").alias("canon"))
    clones = (
        docs.filter(F.col("doc_id") % 6 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("real_id"),
            F.col("doc_id").alias("canon"),
        )
    )
    corpus = base.unionByName(clones)
    media = corpus.join(base_media, "canon")
    return (
        media.groupBy("mime", F.sha2(F.col("payload"), 256).alias("_h"))
        .agg(
            F.min("real_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("mime", "keep_doc_id", "n_copies")
    )


@query(
    "multimodal_decode_quarantine",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'image/bmp'
                WHEN 2 THEN 'image/png' ELSE 'video/mp4' END AS mime,
           doc_id % 10 = 0 AS is_corrupt,
           CAST(CASE WHEN doc_id % 10 = 0 THEN NULL
                     WHEN CAST(doc_id % 4 AS INT) IN (1, 2, 3)
                     THEN 16 + doc_id % 32 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 10 = 0 THEN NULL
                     WHEN CAST(doc_id % 4 AS INT) = 1 THEN 16 + (7 * doc_id) % 32
                     WHEN CAST(doc_id % 4 AS INT) = 2 THEN 16 + (11 * doc_id) % 32
                     WHEN CAST(doc_id % 4 AS INT) = 3 THEN 16 + (13 * doc_id) % 32
                     END AS INT) AS height
    FROM documents
    """,
    survey="§2.9 multimodal (quarantine decode: corrupt payloads become flagged rows, not stage failures)",
)
def multimodal_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corruption-tolerant decode over a corpus where every 10th
    payload is truncated to its first 8 bytes: the quarantined decoder
    flags those rows (NULL decode fields, is_corrupt) and decodes the
    rest normally — proving a bad file costs one row, never the task.
    The truncation defeats all four parsers through their own validity
    checks (RIFF/WAVE tag gone, BMP header short, PNG signature with no
    chunks, ISO-BMFF under 12 bytes). The oracle recomputes the
    fabrication parameters closed-form and NULLs the corrupt subset —
    decoded dims on the healthy rows prove the happy path still runs
    the real parsers."""
    docs = table(spark, sf_dir, "documents")
    media = multimodal.fabricate_media(docs)
    corrupted = media.withColumn(
        "payload",
        F.when(F.col("doc_id") % 10 == 0, F.substring(F.col("payload"), 1, 8)).otherwise(
            F.col("payload")
        ),
    )
    return multimodal.decode_media_quarantined(corrupted).select(
        "doc_id", "mime", "is_corrupt", "width", "height"
    )


@query(
    "audio_energy_windows",
    oracle=f"""
    WITH wav AS (
      -- DISTINCT doc_id: the document identity (round-8 dup sweep
      -- contract) — a byte-identical re-ingested row must not double
      -- the grouped window energies below (the Spark side reduces
      -- per FILE, so its windows would stay single-copy)
      SELECT DISTINCT doc_id FROM documents WHERE doc_id % 4 = 0
    ), pcm AS (
      SELECT doc_id,
             CAST((i // (1 + (doc_id // 4) % 2)) // {multimodal.AUDIO_WIN} AS INT) AS win,
             (doc_id * 31 + i * 7) % 65536 - 32768 AS s
      FROM wav,
           unnest(range(0, (100 + doc_id % 500) * (1 + (doc_id // 4) % 2))) t(i)
    )
    SELECT doc_id, win,
           CAST(COUNT(*) AS INT) AS n_pcm,
           CAST(SUM(s * s) AS BIGINT) AS energy_q,
           CAST(MAX(ABS(s)) AS INT) AS peak_abs,
           MAX(ABS(s)) < {multimodal.AUDIO_SILENCE_PEAK} AS is_silence
    FROM pcm GROUP BY doc_id, win
    """,
    survey="§2.9 multimodal (audio PCM energy/silence windows over REAL WAV decode)",
)
def audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speech-corpus curation primitive: per-window PCM energy and the
    silence flag a trimming/VAD stage gates on, computed by REALLY
    decoding the WAV payloads (RIFF walk → int16 PCM → numpy reduceat
    inside the Arrow batch). Output is window-grain — the PCM itself
    never becomes Spark rows, which is what keeps this viable when the
    audio corpus is the 100 TB side of the house. The oracle recomputes
    every window's exact integer statistics closed-form from doc_id
    (fabrication: sample i = (doc_id·31 + i·7) mod 2¹⁶ − 2¹⁵), so a bug
    in fabricator, RIFF walk, or window reduction breaks the match.
    Only audio payloads cross the Python boundary — the mime filter
    runs JVM-side on the fabricated frame."""
    # Round-15 (guide §4.1: pass only what the function needs): the mime
    # is a pure function of doc_id (Python int(i) % 4 == 0 -> WAV, i.e.
    # pmod), so the WAV predicate runs on the skinny doc_id frame BEFORE
    # fabrication — the builders no longer fabricate (and Arrow no
    # longer ships) the 3/4 of payloads the mime filter discarded.
    # pmod mirrors the builder's Python % exactly (incl. negatives);
    # the JVM-side mime filter stays as the contract gate. Measured
    # 1.14 -> 0.92 s at sf0.1, bit-identical.
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .dropDuplicates()
        .filter(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
    )
    media = multimodal.fabricate_media(docs).filter(F.col("mime") == "audio/wav")
    return multimodal.audio_energy_windows(media)
