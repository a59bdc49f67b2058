"""Driver-contract queries for the multimodal column pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.multimodal.codec import (audio_pcm16_stats,
                                                  decode_images,
                                                  extract_features,
                                                  pack_image_payloads,
                                                  pack_payloads,
                                                  resize_images,
                                                  sample_frames)
from greenplum_dwh_spark.sources.tpch import Tables


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload metadata projection — byte vs char lengths over the
    binary payload column (SQL-checkable plumbing)."""
    packed = pack_payloads(Tables(spark, sf_dir).documents)
    return packed.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.n_chars").alias("n_chars_meta"),
        F.col("meta.mime").alias("mime"),
        F.octet_length("payload").alias("payload_bytes"))


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-feature extraction (mapInPandas plumbing).
    Oracle-exact: every feature is integer arithmetic over the UTF-8
    payload bytes (hex-decoded in the SQL twin) and byte_mean is one
    exact-int double division — identical IEEE result both engines."""
    return extract_features(pack_payloads(Tables(spark, sf_dir).documents))


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image column: pack each document's bytes into a real
    24-bit BMP container, then parse the container header back with the
    pure-Python decoder. Dimensions are deterministic from the byte
    length (width 16, height = ceil(bytes/48)), so the decode is fully
    oracle-checkable."""
    packed = pack_image_payloads(Tables(spark, sf_dir).documents, width=16)
    return decode_images(packed)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real pixel-level resize: pack each document into a 24-bit BMP,
    nearest-neighbor downsample by 2 in pure Python, decode the
    resized container back.  Output dimensions are deterministic from
    the byte length, so the whole pipeline is oracle-checkable."""
    packed = pack_image_payloads(Tables(spark, sf_dir).documents, width=16)
    return decode_images(resize_images(packed, factor=2))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over fixed-size frames (64 B, every
    4th): counts and the md5 of the sampled bytes' hex are pure byte
    arithmetic, reproduced exactly by the SQL oracle."""
    packed = pack_payloads(Tables(spark, sf_dir).documents)
    return sample_frames(packed, frame_bytes=64, every_k=4)


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 audio-kernel plumbing: sample count, exact integer energy
    and |peak| over the payload interpreted as s16le samples."""
    packed = pack_payloads(Tables(spark, sf_dir).documents)
    return audio_pcm16_stats(packed)


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_decode": multimodal_decode,
    "multimodal_resize": multimodal_resize,
    "multimodal_frames": multimodal_frames,
    "multimodal_audio": multimodal_audio,
}

#: byte-level twin of the mapInPandas feature kernel: the payload is
#: the UTF-8 encoding of ``text``, recovered byte-by-byte from
#: ``hex(encode(text))`` (2 hex chars per byte — correct for any
#: input, not just ASCII)
_BYTES = ("list_transform(range(0, strlen(text)), "
          "i -> ('0x' || substr(hex(encode(text)), 2*i+1, 2))::INT)")

ORACLES = {
    "multimodal_features": f"""
        WITH b AS (SELECT doc_id, strlen(text) AS n_bytes,
                          coalesce(list_sum({_BYTES}), 0) AS sum_bytes,
                          coalesce(list_max({_BYTES}), 0) AS byte_max,
                          lower(substr(hex(encode(text)), 1, 8)) AS head_hex
                   FROM documents)
        SELECT doc_id, n_bytes::INT AS n_bytes,
               sum_bytes::BIGINT AS sum_bytes,
               CASE WHEN n_bytes = 0 THEN 0.0
                    ELSE sum_bytes::DOUBLE / n_bytes END AS byte_mean,
               byte_max::INT AS byte_max, head_hex
        FROM b""",
    "multimodal_meta": """
        SELECT doc_id,
               strlen(text)::INT AS n_bytes,
               length(text)::INT AS n_chars_meta,
               'text/plain' AS mime,
               strlen(text)::INT AS payload_bytes
        FROM documents""",
    "multimodal_decode": """
        SELECT doc_id,
               'bmp' AS format,
               16::INT AS width,
               greatest(1, ceil(strlen(text) / 48.0))::INT AS height,
               3::INT AS channels
        FROM documents""",
    # resize by 2 of the 16-wide BMP: w 16→8, h → max(1, h//2)
    "multimodal_resize": """
        SELECT doc_id,
               'bmp' AS format,
               8::INT AS width,
               greatest(1, greatest(1, ceil(strlen(text) / 48.0))::INT // 2
                        )::INT AS height,
               3::INT AS channels
        FROM documents""",
    # 64-byte frames, every 4th sampled; frame i = 128 hex chars at
    # offset i*128 of the payload hex; sampled stride = 512 hex chars
    "multimodal_frames": """
        WITH b AS (SELECT doc_id,
                          lower(hex(encode(text))) AS hx,
                          (strlen(text) // 64)::INT AS nf
                   FROM documents),
        s AS (SELECT doc_id, nf, ((nf + 3) // 4)::INT AS ns, hx FROM b)
        SELECT doc_id, nf AS n_frames, ns AS n_sampled,
               md5(coalesce(array_to_string(
                   list_transform(range(0, ns),
                                  j -> substr(hx, j * 512 + 1, 128)),
                   ''), '')) AS sampled_md5
        FROM s""",
    # s16le samples from byte pairs: u = lo + 256*hi; signed = u - 2^16
    # when u >= 2^15; energy and peak are exact integer folds
    "multimodal_audio": """
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                          (strlen(text) // 2)::INT AS n
                   FROM documents),
        s AS (SELECT doc_id, n,
                     list_transform(range(0, n), i ->
                         (('0x' || substr(hx, i*4 + 1, 2))::BIGINT
                          + 256 * ('0x' || substr(hx, i*4 + 3, 2))::BIGINT)
                     ) AS us
              FROM b),
        v AS (SELECT doc_id, n,
                     list_transform(us, u ->
                         u - 65536 * (u >= 32768)::BIGINT) AS xs
              FROM s)
        SELECT doc_id, n AS n_samples,
               coalesce(list_sum(list_transform(xs, x -> x * x)), 0)::BIGINT
                   AS sum_sq,
               coalesce(list_max(list_transform(xs, x -> abs(x))), 0)::INT
                   AS peak
        FROM v""",
}
