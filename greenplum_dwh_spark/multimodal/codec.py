"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §7 M6 / BASELINE.json north star): image/audio/video
travel as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` so each Python worker touches one batch
of payloads at a time (bounded memory at 100 TB, no driver collect).

The container has no image/audio libraries, so the *decode* kernel is
stubbed: ``decode_image`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected. Everything around it — schema,
partitioning, batch iteration, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("byte_mean", T.DoubleType()),
    T.StructField("byte_max", T.IntegerType()),
    T.StructField("head_hex", T.StringType()),
])


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload into (width, height, channels).

    STUB: real decoding needs an image library not present in this
    container. ``fake=True`` selects the deterministic fake decoder
    used by tests; production wiring would swap in PIL/libvips here.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library; "
            "use fake=True for the deterministic test decoder")
    return {"width": 1 + payload[0] if payload else 0,
            "height": 1 + (payload[-1] if payload else 0),
            "channels": 3}


def pack_payloads(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.length("text").alias("n_chars"),
            F.lit("text/plain").alias("mime")).alias("meta"))


def extract_features(packed: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction over mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                "byte_mean": payloads.map(
                    lambda b: (sum(b) / len(b)) if len(b) else 0.0),
                "byte_max": payloads.map(
                    lambda b: max(b) if len(b) else 0).astype("int32"),
                "head_hex": payloads.map(lambda b: b[:4].hex()),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(
        run, FEATURE_SCHEMA)
