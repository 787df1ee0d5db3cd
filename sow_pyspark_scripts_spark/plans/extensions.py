"""Registered extension queries: multimodal plumbing and the Structured
Streaming twin of the tumbling aggregate (run via availableNow and
compared against the SAME oracle as its batch form — streaming and batch
must agree on static input)."""

from __future__ import annotations

from ..functions.pin import pin as _pin_lazy, pin_eager as _pin_eager

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import decode_media, media_table
from ..registry import query
from ..sources import read_table
from ..streaming.pipeline import run_to_memory, tumbling_agg_stream


@query(
    "multimodal_bytes_meta",
    """
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)
def multimodal_bytes_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column contract: opaque binary payload + typed metadata.
    Byte length diverges from char length exactly where text is non-ASCII
    — the check that the payload really is bytes, not chars."""
    from pyspark.sql import functions as F

    media = media_table(read_table(spark, sf_dir, "documents"))
    chars = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars_measured")
    )
    return media.join(chars, "doc_id").select(
        "doc_id", "media_type", "n_bytes", "n_chars_measured"
    )


@query(
    "multimodal_decode_stub",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS width,
           CAST(16 + instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS BIGINT) AS height,
           CAST(1 + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) % 8 AS BIGINT) AS n_frames
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode stage over binary payloads (deterministic fake
    decoder — real PIL/ffmpeg decode is stubbed, SURVEY.md container
    constraint). The Arrow batch plumbing, schema, and partitioning are
    the real thing; the oracle reproduces the fake from md5."""
    media = media_table(read_table(spark, sf_dir, "documents"))
    return decode_media(media, fake_decode=True)


_NIB = "instr('0123456789abcdef', substring(md5(text), {j}, 1)) - 1"
_W = f"CAST(16 + {_NIB.format(j=1)} AS BIGINT)"
_H = f"CAST(16 + {_NIB.format(j=2)} AS BIGINT)"
_NF = f"CAST(1 + ({_NIB.format(j=3)}) % 8 AS BIGINT)"


@query(
    "multimodal_resize_stub",
    f"""
    WITH d AS (SELECT doc_id, {_W} AS width, {_H} AS height FROM documents)
    SELECT doc_id, width, height,
           CAST(floor(width * least(1.0, 24.0 / greatest(width, height))) AS BIGINT) AS new_width,
           CAST(floor(height * least(1.0, 24.0 / greatest(width, height))) AS BIGINT) AS new_height
    FROM d
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas resize stage over decoded media metadata: max-dim 24,
    aspect preserved, no upscaling. Geometry arithmetic is the testable
    contract; the pixel work is the stubbed codec's job."""
    from ..operators.multimodal import resize_media

    media = media_table(read_table(spark, sf_dir, "documents"))
    return resize_media(decode_media(media, fake_decode=True), max_dim=24)


@query(
    "multimodal_frame_sample",
    f"""
    WITH d AS (SELECT doc_id, {_NF} AS n_frames FROM documents)
    SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx
    FROM d
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (stride 2) from decoded frame counts: JVM-side
    sequence+explode — index generation needs no Python; only per-frame
    pixel extraction would."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import sample_frames

    media = media_table(read_table(spark, sf_dir, "documents"))
    out = sample_frames(decode_media(media, fake_decode=True), stride=2)
    return out.select("doc_id", "n_frames", F.col("frame_idx").cast("long").alias("frame_idx"))


@query("streaming_sliding_agg", None)  # oracle aliased in registry (shares events_sliding_agg)
def streaming_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sliding_agg (10 min window, 5 min slide),
    drained availableNow; shares the batch oracle."""
    from pyspark.sql import functions as F

    from ..streaming.pipeline import stream_events

    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )
    return run_to_memory(agg, "complete", sf_dir=sf_dir)


@query("streaming_tumbling_agg", None)  # oracle aliased in registry (shares events_tumbling_agg)
def streaming_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of events_tumbling_agg: file-source
    readStream -> watermark -> tumbling agg -> availableNow drain into a
    memory sink. On static input it must equal the batch result — so it
    shares the batch oracle."""
    return run_to_memory(tumbling_agg_stream(spark, sf_dir), "complete", sf_dir=sf_dir)


@query(
    "streaming_dedup_watermark",
    """
    SELECT event_id, user_id, event_type FROM events
    """,
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark drained over the static fixture:
    event_ids are unique there, so the exact oracle is the identity
    projection — which checks the non-trivial part (the stream saw every
    row and dropped none; state bounded by the watermark, not by history)."""
    from ..streaming.pipeline import dedup_within_watermark_stream

    return run_to_memory(
        dedup_within_watermark_stream(spark, sf_dir), "append", sf_dir=sf_dir
    )


_SR = "CAST(8000 * (1 + (instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1) % 3) AS BIGINT)"
_NS = (
    f"CAST({_SR} * (30 + 20 * ((instr('0123456789abcdef', substring(md5(text), 5, 1)) - 1)"
    f" + (instr('0123456789abcdef', substring(md5(text), 6, 1)) - 1))) AS BIGINT)"
)


@query(
    "multimodal_audio_chunks",
    f"""
    WITH a AS (SELECT doc_id, {_SR} AS sample_rate, {_NS} AS n_samples FROM documents),
    chunks AS (
      SELECT doc_id, sample_rate, n_samples,
             unnest(range(0, (n_samples + sample_rate * 10 - 1)
                             // (sample_rate * 10))) AS chunk_idx
      FROM a
    )
    SELECT doc_id, sample_rate,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * sample_rate * 10 AS BIGINT) AS start_sample,
           CAST(least((chunk_idx + 1) * sample_rate * 10, n_samples) AS BIGINT)
               AS end_sample,
           CAST(chunk_idx * sample_rate * 10 * 2 AS BIGINT) AS byte_offset
    FROM chunks
    """,
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing for ASR ingest: probe each payload's (sample
    rate, sample count) via the Arrow mapInPandas probe stage
    (`operators/multimodal.py probe_audio` — real probe stubbed, fake
    deterministic), then cut 10-second chunks with exact sample/byte
    offsets (16-bit mono) JVM-side via sequence+explode — the chunk
    manifest a transcription fleet consumes. Completes the multimodal
    family's third modality (image decode/resize, video frame-sample,
    audio chunking).

    Per-row fan-out is bounded by clip length; offsets are pure integer
    arithmetic so the chunk manifest hash-matches the oracle."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import media_table, probe_audio

    a = probe_audio(media_table(read_table(spark, sf_dir, "documents")))
    chunk_len = F.col("sample_rate") * 10
    n_chunks = F.ceil(F.col("n_samples") / chunk_len).cast("long")
    chunks = a.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    return chunks.select(
        "doc_id",
        "sample_rate",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * chunk_len).cast("long").alias("start_sample"),
        F.least((F.col("chunk_idx") + 1) * chunk_len, F.col("n_samples"))
        .cast("long")
        .alias("end_sample"),
        (F.col("chunk_idx") * chunk_len * 2).cast("long").alias("byte_offset"),
    )


# ---------------------------------------------------------------------------
# multimodal_blockhash_dedup — binary near-dup via content-defined block hash
# ---------------------------------------------------------------------------

_BH_BITS = 16
# chunking happens on the HEX encoding of the payload (2 chars/byte):
# DuckDB has no BLOB substring, and hex() is identical (uppercase) in
# both engines, so the chunks — and therefore the hash — agree exactly
_BH_CHUNK_LEN = (
    "CAST(greatest(CAST(ceil(length(hex(encode(text))) / 16.0) AS BIGINT), 1)"
    " AS BIGINT)"
)
_BH_BIT = (
    "((instr('0123456789abcdef', substring(md5("
    "substring(hx, CAST(1 + {b} * clen AS BIGINT), clen)"
    "), 1, 1)) - 1) % 2)"
)
_BH_COMBINE = " + ".join(
    f"(CASE WHEN {_BH_BIT.format(b=b)} = 1 THEN {2**b} ELSE 0 END)"
    for b in range(_BH_BITS)
)
_BH_BANDS = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band_id, (bh // {16 ** b}) % 16 AS nib FROM bh_t"
    for b in range(4)
)

_BLOCKHASH_ORACLE = f"""
WITH bh_t AS (
  SELECT doc_id, CAST({_BH_COMBINE} AS BIGINT) AS bh
  FROM (SELECT doc_id, hex(encode(text)) AS hx, {_BH_CHUNK_LEN} AS clen
        FROM documents)
),
bands AS (
{_BH_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.nib = b.nib AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha.bh, hb.bh)) AS BIGINT) AS hamming
FROM cand
JOIN bh_t ha ON ha.doc_id = doc_a
JOIN bh_t hb ON hb.doc_id = doc_b
WHERE bit_count(xor(ha.bh, hb.bh)) <= 3
"""


@query("multimodal_blockhash_dedup", _BLOCKHASH_ORACLE)
def multimodal_blockhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-dup detection WITHOUT decoding: a 16-bit content-
    defined block hash over the opaque payload bytes (payload split into
    16 equal byte chunks, bit b = parity of md5(chunk_b)'s first nibble
    — a payload differing in one region flips at most the bits whose
    chunks it touches), then the same pigeonhole hamming<=3 multi-index
    as `dedup_simhash_hamming`. This is the codec-independent dedup
    every media lake runs BEFORE decode: re-encodes differ everywhere
    (caught by nothing short of perceptual hashing), but the dominant
    duplicate classes — identical files, truncations, metadata-tag edits
    — collide here at zero decode cost. Payloads here are the fixture's
    utf-8 bytes; with image/audio/video columns the identical plan runs
    on the stored bytes.

    Plan shape: the hash is pure codegen over one substring/md5 chain
    per chunk (no explode, no Python); bands fan out 4 rows/doc; the
    self-join moves (nibble, id) pairs and the verify re-reads two
    16-bit ints per candidate. All integer arithmetic — exact in both
    engines."""
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    media = media_table(docs)
    with_len = media.select(
        "doc_id",
        F.hex("payload").alias("hx"),
        F.greatest(
            F.ceil((F.col("n_bytes") * 2) / F.lit(16.0)).cast("long"), F.lit(1)
        ).alias("clen"),
    )
    bit = lambda b: (  # noqa: E731
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(
                    F.md5(
                        F.expr(
                            f"substring(hx, CAST(1 + {b} * clen AS INT), "
                            "CAST(clen AS INT))"
                        )
                    ),
                    1,
                    1,
                ),
            )
            - 1
        )
        % 2
    )
    bh = None
    for b in range(_BH_BITS):
        term = F.when(bit(b) == 1, F.lit(2**b)).otherwise(F.lit(0))
        bh = term if bh is None else bh + term
    # localCheckpoint, not persist: no CacheManager entry leaked for the
    # session lifetime (ADVICE r3; same fix as sql_recursive_bom)
    hashes = with_len.select("doc_id", bh.cast("long").alias("bh")).transform(_pin_lazy)
    band_rows = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                ((F.col("bh") / F.lit(16**b)).cast("long") % 16).alias("nib"),
            )
            for b in range(4)
        ]
    )
    bands = hashes.select("doc_id", F.explode(band_rows).alias("bd")).select(
        "doc_id", F.col("bd.band_id").alias("band_id"), F.col("bd.nib").alias("nib")
    )
    a, b2 = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = hashes.select(F.col("doc_id").alias("doc_a"), F.col("bh").alias("ha"))
    hb = hashes.select(F.col("doc_id").alias("doc_b"), F.col("bh").alias("hb"))
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 3)
    )
