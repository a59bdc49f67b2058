"""Driver-contract queries for the multimodal column pipeline.

Round-7 consolidation (round-6 verdict item 3): the former six
near-identical oracle rows (meta / features / decode / resize /
frames / audio) are now THREE queries that each exercise strictly
more of the pipeline per row — and with better plan shapes:

- ``multimodal_features`` absorbs the meta projection by passing the
  typed ``meta`` struct THROUGH the feature kernel (one scan, one
  Python stage, no self-join).
- ``multimodal_decode`` absorbs the resize query as a labeled UNION
  of original and factor-2-resized container decodes (union is free —
  no shuffle; both legs share the packed-BMP scan).
- ``multimodal_av`` fuses frame sampling and PCM16 audio stats into
  one Arrow pass over the payloads (bytes decoded once, not once per
  modality); fused ≡ modular is unit-pinned.

Every column remains pure byte arithmetic over the UTF-8 payload, so
the DuckDB oracles stay bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.multimodal.codec import (av_stats,
                                                  decode_images,
                                                  extract_features,
                                                  pack_image_payloads,
                                                  pack_payloads,
                                                  resize_images)
from greenplum_dwh_spark.sources.tpch import Tables


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-feature extraction + metadata projection
    (mapInPandas plumbing; absorbs the former ``multimodal_meta``).
    Oracle-exact: every feature is integer arithmetic over the UTF-8
    payload bytes (hex-decoded in the SQL twin) and byte_mean is one
    exact-int double division — identical IEEE result both engines."""
    packed = pack_payloads(Tables(spark, sf_dir).documents)
    return extract_features(packed, include_meta=True)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image column, original AND resized (absorbs the
    former ``multimodal_resize``): pack each document's bytes into a
    real 24-bit BMP container, decode the header back; in the second
    leg, nearest-neighbor downsample by 2 in pure Python first.
    Dimensions are deterministic from the byte length (width 16,
    height = ceil(bytes/48); resized: 8 × max(1, h//2)), so both legs
    are fully oracle-checkable."""
    packed = pack_image_payloads(Tables(spark, sf_dir).documents, width=16)
    orig = decode_images(packed).withColumn("stage", F.lit("orig"))
    resized = (decode_images(resize_images(packed, factor=2))
               .withColumn("stage", F.lit("resized")))
    return orig.unionByName(resized)


def multimodal_av(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused frame-sampling + PCM16 audio kernel (absorbs the former
    ``multimodal_frames`` and ``multimodal_audio``): fixed 64-byte
    frames with every 4th sampled and md5-fingerprinted, plus exact
    integer energy and |peak| over the payload as s16le samples —
    one Arrow pass, all columns byte-arithmetic-reproducible."""
    packed = pack_payloads(Tables(spark, sf_dir).documents)
    return av_stats(packed, frame_bytes=64, every_k=4)


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_decode": multimodal_decode,
    "multimodal_av": multimodal_av,
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
                          length(text) AS n_chars,
                          coalesce(list_sum({_BYTES}), 0) AS sum_bytes,
                          coalesce(list_max({_BYTES}), 0) AS byte_max,
                          lower(substr(hex(encode(text)), 1, 8)) AS head_hex
                   FROM documents)
        SELECT doc_id, n_bytes::INT AS n_bytes,
               sum_bytes::BIGINT AS sum_bytes,
               CASE WHEN n_bytes = 0 THEN 0.0
                    ELSE sum_bytes::DOUBLE / n_bytes END AS byte_mean,
               byte_max::INT AS byte_max, head_hex,
               n_bytes::INT AS n_bytes_meta,
               n_chars::INT AS n_chars_meta,
               'text/plain' AS mime
        FROM b""",
    # original decode UNION resize-by-2: w 16→8, h → max(1, h//2)
    "multimodal_decode": """
        WITH h AS (SELECT doc_id,
                          greatest(1, ceil(strlen(text) / 48.0))::INT AS ht
                   FROM documents)
        SELECT doc_id, 'bmp' AS format, 16::INT AS width,
               ht AS height, 3::INT AS channels, 'orig' AS stage
        FROM h
        UNION ALL
        SELECT doc_id, 'bmp' AS format, 8::INT AS width,
               greatest(1, ht // 2)::INT AS height, 3::INT AS channels,
               'resized' AS stage
        FROM h""",
    # 64-byte frames, every 4th sampled (frame i = 128 hex chars at
    # offset i*128; sampled stride = 512 hex chars) + s16le samples
    # from byte pairs: u = lo + 256*hi; signed = u - 2^16 at u >= 2^15
    "multimodal_av": """
        WITH b AS (SELECT doc_id,
                          lower(hex(encode(text))) AS hx,
                          (strlen(text) // 64)::INT AS nf,
                          (strlen(text) // 2)::INT AS n
                   FROM documents),
        s AS (SELECT doc_id, nf, ((nf + 3) // 4)::INT AS ns, hx, n FROM b),
        v AS (SELECT doc_id, nf, ns, hx, n,
                     list_transform(
                         list_transform(range(0, n), i ->
                             ('0x' || substr(hx, i*4 + 1, 2))::BIGINT
                             + 256 * ('0x' || substr(hx, i*4 + 3, 2))::BIGINT),
                         u -> u - 65536 * (u >= 32768)::BIGINT) AS xs
              FROM s)
        SELECT doc_id, nf AS n_frames, ns AS n_sampled,
               md5(coalesce(array_to_string(
                   list_transform(range(0, ns),
                                  j -> substr(hx, j * 512 + 1, 128)),
                   ''), '')) AS sampled_md5,
               n AS n_samples,
               coalesce(list_sum(list_transform(xs, x -> x * x)), 0)::BIGINT
                   AS sum_sq,
               coalesce(list_max(list_transform(xs, x -> abs(x))), 0)::INT
                   AS peak
        FROM v""",
}
