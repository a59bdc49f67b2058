"""Driver-contract queries for the multimodal column pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greenplum_dwh_spark.multimodal.codec import (decode_images,
                                                  extract_features,
                                                  pack_image_payloads,
                                                  pack_payloads)
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
    """Arrow-batched byte-feature extraction (mapInPandas plumbing);
    byte_mean is Python-float arithmetic → rows-only check."""
    return extract_features(pack_payloads(Tables(spark, sf_dir).documents))


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image column: pack each document's bytes into a real
    24-bit BMP container, then parse the container header back with the
    pure-Python decoder. Dimensions are deterministic from the byte
    length (width 16, height = ceil(bytes/48)), so the decode is fully
    oracle-checkable."""
    packed = pack_image_payloads(Tables(spark, sf_dir).documents, width=16)
    return decode_images(packed)


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,   # rows-only
    "multimodal_decode": multimodal_decode,
}

ORACLES = {
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
}
