"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §7 M6 / BASELINE.json north star): image/audio/video
travel as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` so each Python worker touches one batch
of payloads at a time (bounded memory at 100 TB, no driver collect).

The *decode* kernel is a real pure-Python container-header parser for
PNG / BMP / GIF / JPEG (dimensions + channel count — the metadata a
training-data pipeline filters and buckets on without full pixel
decode); full pixel decoding would swap PIL/libvips into the same
mapInPandas seam. ``encode_bmp`` writes genuine 24-bit BMP containers
so the decode path is exercised on real image bytes end-to-end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sum_bytes", T.LongType()),
    T.StructField("byte_mean", T.DoubleType()),
    T.StructField("byte_max", T.IntegerType()),
    T.StructField("head_hex", T.StringType()),
])

#: PNG color type → samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: JPEG SOFn markers carrying frame dimensions (ITU T.81 §B.2.2);
#: C4/C8/CC are DHT/JPG/DAC, not frames.
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def decode_image(payload: bytes) -> dict | None:
    """Parse an image container header into
    ``{"format", "width", "height", "channels"}``.

    Pure-Python (struct unpacks only, no image library): PNG IHDR,
    BMP BITMAPINFOHEADER, GIF logical screen descriptor, JPEG SOFn
    frame header. Returns ``None`` for unrecognized or truncated
    payloads — the mapInPandas callers surface that as null columns
    rather than failing the batch.
    """
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 \
            and b[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", b, 16)
        depth, color = b[24], b[25]
        if color not in _PNG_CHANNELS or w == 0 or h == 0:
            return None
        return {"format": "png", "width": w, "height": h,
                "channels": _PNG_CHANNELS[color]}
    if b[:2] == b"BM" and len(b) >= 30:
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        if w <= 0 or h == 0 or bpp == 0:
            return None
        return {"format": "bmp", "width": w, "height": abs(h),
                "channels": max(1, bpp // 8)}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack_from("<HH", b, 6)
        if w == 0 or h == 0:
            return None
        return {"format": "gif", "width": w, "height": h, "channels": 3}
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:          # desynced — not a valid stream
                return None
            marker = b[i + 1]
            if marker == 0xFF:        # fill bytes before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2                # standalone markers, no length
                continue
            if marker == 0xD9:        # EOI before any SOF
                return None
            seg_len = struct.unpack_from(">H", b, i + 2)[0]
            if marker in _JPEG_SOF:
                if i + 4 + 5 > len(b):
                    return None
                h, w = struct.unpack_from(">HH", b, i + 5)
                channels = b[i + 9]
                if w == 0 or h == 0:
                    return None
                return {"format": "jpeg", "width": w, "height": h,
                        "channels": channels}
            i += 2 + seg_len
        return None
    return None


def encode_bmp(data: bytes, width: int = 16) -> bytes:
    """Pack raw bytes into a genuine 24-bit bottom-up BMP container
    (BITMAPFILEHEADER + BITMAPINFOHEADER + zero-padded pixel rows).

    ``height = max(1, ceil(len(data) / (3*width)))`` — deterministic
    from the byte length, so decoded dimensions stay SQL-derivable for
    the DuckDB oracle."""
    row_bytes = width * 3
    height = max(1, -(-len(data) // row_bytes))
    stride = (row_bytes + 3) & ~3            # rows pad to 4 bytes
    pixels = bytearray(stride * height)
    for r in range(height):
        chunk = data[r * row_bytes:(r + 1) * row_bytes]
        # bottom-up row order, as positive-height BMPs require
        off = (height - 1 - r) * stride
        pixels[off:off + len(chunk)] = chunk
    header_size = 14 + 40
    file_size = header_size + len(pixels)
    return (struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          len(pixels), 2835, 2835, 0, 0)
            + bytes(pixels))


def pack_payloads(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.length("text").alias("n_chars"),
            F.lit("text/plain").alias("mime")).alias("meta"))


def extract_features(packed: DataFrame,
                     include_meta: bool = False) -> DataFrame:
    """Arrow-batched byte-level feature extraction over mapInPandas.

    ``include_meta=True`` additionally carries the typed ``meta``
    struct's fields THROUGH the kernel (n_bytes_meta / n_chars_meta /
    mime) — the meta-vs-payload consistency projection in the SAME
    single pass over the payloads, with no self-join back to the
    packed frame (the round-7 consolidation of the former
    ``multimodal_meta`` query: one scan, one Python stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            sums = payloads.map(sum)
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                # exact integer ingredients (sum_bytes, n_bytes) make
                # byte_mean a single exact-int double division —
                # bit-reproducible by the SQL oracle
                "sum_bytes": sums.astype("int64"),
                "byte_mean": [
                    (s / len(b)) if len(b) else 0.0
                    for s, b in zip(sums, payloads)],
                "byte_max": payloads.map(
                    lambda b: max(b) if len(b) else 0).astype("int32"),
                "head_hex": payloads.map(lambda b: b[:4].hex()),
            }
            if include_meta:
                out["n_bytes_meta"] = pdf["n_bytes_meta"].astype("int32")
                out["n_chars_meta"] = pdf["n_chars_meta"].astype("int32")
                out["mime"] = pdf["mime"]
            yield pd.DataFrame(out)

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    if include_meta:
        schema = T.StructType(FEATURE_SCHEMA.fields + [
            T.StructField("n_bytes_meta", T.IntegerType()),
            T.StructField("n_chars_meta", T.IntegerType()),
            T.StructField("mime", T.StringType())])
        return packed.select(
            "doc_id", "payload",
            F.col("meta.n_bytes").alias("n_bytes_meta"),
            F.col("meta.n_chars").alias("n_chars_meta"),
            F.col("meta.mime").alias("mime")).mapInPandas(run, schema)
    return packed.select("doc_id", "payload").mapInPandas(
        run, FEATURE_SCHEMA)


DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
])


def pack_image_payloads(docs: DataFrame, width: int = 16) -> DataFrame:
    """documents → (doc_id, payload binary) where payload is a real BMP
    container carrying the document's UTF-8 bytes as pixel data —
    genuine image binaries without needing image assets in the corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pdf["text"].map(
                    lambda s: encode_bmp(s.encode("utf-8"), width)),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(docs.sparkSession)
    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id bigint, payload binary")


def resize_bmp(payload: bytes, factor: int = 2) -> bytes | None:
    """Nearest-neighbor downsample of a 24-bit BMP by an integer
    factor — a REAL pixel-level resize in pure Python (no image lib):
    parse the header, sample every ``factor``-th pixel of every
    ``factor``-th row, re-encode.  Returns ``None`` for payloads that
    are not 24-bit BMPs (the mapInPandas caller surfaces null)."""
    import numpy as np
    meta = decode_image(payload)
    if meta is None or meta["format"] != "bmp" or meta["channels"] != 3:
        return None
    b = bytes(payload)
    w, h = meta["width"], meta["height"]
    data_off = struct.unpack_from("<I", b, 10)[0]
    stride = (w * 3 + 3) & ~3
    nw, nh = max(1, w // factor), max(1, h // factor)
    n_stride = (nw * 3 + 3) & ~3
    # vectorized nearest-neighbor: rows are stored bottom-up; sample
    # image rows/cols 0, factor, 2·factor… anchored at the TOP-LEFT
    # origin (stored row for image row i is h−1−i), so resized pixel
    # (0,0) equals source pixel (0,0)
    img = (np.frombuffer(b, np.uint8, stride * h, data_off)
           .reshape(h, stride)[::-1, :w * 3].reshape(h, w, 3))
    sampled = img[::factor, ::factor][:nh, :nw]
    pixels = np.zeros((nh, n_stride), np.uint8)
    pixels[:, :nw * 3] = sampled.reshape(nh, nw * 3)
    pixels = pixels[::-1].tobytes()
    header_size = 14 + 40
    return (struct.pack("<2sIHHI", b"BM", header_size + len(pixels), 0, 0,
                        header_size)
            + struct.pack("<IiiHHIIiiII", 40, nw, nh, 1, 24, 0,
                          len(pixels), 2835, 2835, 0, 0)
            + pixels)


def resize_images(packed: DataFrame, factor: int = 2) -> DataFrame:
    """Arrow-batched BMP downsample over mapInPandas:
    (doc_id, payload) → (doc_id, payload) with resized containers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pdf["payload"].map(
                    lambda p: resize_bmp(p, factor)),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(
        run, "doc_id bigint, payload binary")


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_sampled", T.IntegerType()),
    T.StructField("sampled_md5", T.StringType()),
])


def sample_frames(packed: DataFrame, frame_bytes: int = 64,
                  every_k: int = 4) -> DataFrame:
    """Frame sampling plumbing for video-shaped payloads: the payload
    is treated as a sequence of fixed-size ``frame_bytes`` frames (a
    real container parser — or the codec a cluster would ship — slots
    into the same seam; no video lib exists in this environment, per
    the multimodal stub policy), every ``every_k``-th frame is kept,
    and the sample is fingerprinted.  Schema, batching and the sampled
    digest are all real and oracle-reproducible from byte arithmetic."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames, n_sampled, digests = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                nf = len(b) // frame_bytes
                idx = range(0, nf, every_k)
                sampled = [b[i * frame_bytes:(i + 1) * frame_bytes]
                           for i in idx]
                n_frames.append(nf)
                n_sampled.append(len(sampled))
                digests.append(hashlib.md5(
                    "".join(s.hex() for s in sampled).encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_frames": pd.Series(n_frames, dtype="int32"),
                "n_sampled": pd.Series(n_sampled, dtype="int32"),
                "sampled_md5": digests,
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(
        run, FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("peak", T.IntegerType()),
])


def audio_pcm16_stats(packed: DataFrame) -> DataFrame:
    """Audio-kernel plumbing: the payload is interpreted as raw PCM
    signed-16-bit little-endian samples (a WAV/FLAC parser — or the
    audio lib a cluster would ship — slots into this seam; none exists
    in this environment, per the multimodal stub policy).  Sample
    count, energy (Σ sample², exact int64) and |peak| are pure integer
    arithmetic over the bytes — reproduced exactly by the SQL oracle.
    A trailing odd byte is ignored (incomplete sample)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, ss, pk = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                x = np.frombuffer(
                    b[:len(b) - (len(b) % 2)], "<i2").astype(np.int64)
                ns.append(x.size)
                # int64 squares: |sample| ≤ 2^15 so Σx² < n·2^30 —
                # exact (no float path) up to ~2^33 samples per doc
                ss.append(int((x * x).sum()))
                pk.append(int(np.abs(x).max()) if x.size else 0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_samples": pd.Series(ns, dtype="int32"),
                "sum_sq": pd.Series(ss, dtype="int64"),
                "peak": pd.Series(pk, dtype="int32"),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(
        run, AUDIO_SCHEMA)


AV_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_sampled", T.IntegerType()),
    T.StructField("sampled_md5", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("peak", T.IntegerType()),
])


def av_stats(packed: DataFrame, frame_bytes: int = 64,
             every_k: int = 4) -> DataFrame:
    """Fused frame-sampling + PCM16 audio kernel: both stat families
    from ONE Arrow batch pass over the payloads (the payload bytes are
    decoded once, not once per modality) — the plan a 100 TB pipeline
    wants when several per-doc kernels consume the same binary column.
    Column semantics are identical to :func:`sample_frames` +
    :func:`audio_pcm16_stats`; the unit test pins fused ≡ modular."""
    import hashlib

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nf_l, nsamp_l, dig_l, n_l, ss_l, pk_l = [], [], [], [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                nf = len(b) // frame_bytes
                sampled = [b[i * frame_bytes:(i + 1) * frame_bytes]
                           for i in range(0, nf, every_k)]
                nf_l.append(nf)
                nsamp_l.append(len(sampled))
                dig_l.append(hashlib.md5(
                    "".join(s.hex() for s in sampled).encode()).hexdigest())
                x = np.frombuffer(
                    b[:len(b) - (len(b) % 2)], "<i2").astype(np.int64)
                n_l.append(x.size)
                ss_l.append(int((x * x).sum()))
                pk_l.append(int(np.abs(x).max()) if x.size else 0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_frames": pd.Series(nf_l, dtype="int32"),
                "n_sampled": pd.Series(nsamp_l, dtype="int32"),
                "sampled_md5": dig_l,
                "n_samples": pd.Series(n_l, dtype="int32"),
                "sum_sq": pd.Series(ss_l, dtype="int64"),
                "peak": pd.Series(pk_l, dtype="int32"),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(run, AV_SCHEMA)


def decode_images(packed: DataFrame) -> DataFrame:
    """Arrow-batched container-header decode over mapInPandas:
    (doc_id, payload) → (doc_id, format, width, height, channels);
    unrecognized payloads yield nulls."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(decode_image)
            get = lambda k: metas.map(
                lambda m: m[k] if m is not None else None)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "format": get("format"),
                "width": get("width").astype("Int32"),
                "height": get("height").astype("Int32"),
                "channels": get("channels").astype("Int32"),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(
        run, DECODE_SCHEMA)


DHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("h1", T.LongType()),
    T.StructField("h2", T.LongType()),
])

#: dHash grid: 16 sampled rows × 9 sampled columns → 8 horizontal
#: gradient comparisons per row = 128 bits, packed as two int64
#: halves (rows 0-7 → h1, rows 8-15 → h2).  128 bits (vs the classic
#: 64) buys 16-bit LSH bands — the band alphabet that keeps banded
#: buckets sparse at corpus scale (8 bands × 65 536 keys).
DHASH_ROWS = 16
DHASH_COLS = 9


def dhash_bmp(payload: bytes) -> tuple[int, int] | None:
    """128-bit difference hash of a 24-bit BMP — the classic dHash
    recipe (downsample to a small grid, emit 1 bit per horizontal
    luminance gradient) in pure numpy over the real pixel rows, no
    image library.  Grayscale is the exact integer CHANNEL SUM
    (order-free, division-free — bit-reproducible by the byte-level
    SQL oracle), the grid is nearest-neighbor top-left-anchored
    (the :func:`resize_bmp` convention: sampled row ``gy`` reads
    source row ``gy*h//16``, sampled col ``gx`` reads ``gx*w//9``),
    and each packed half wraps to signed int64 so Spark/DuckDB BIGINT
    columns carry it natively.  Returns ``None`` for payloads that
    are not 24-bit BMPs — including structurally declared but
    TRUNCATED ones (header stride·height exceeding the buffer), so a
    malformed row degrades to a null hash instead of failing its
    whole Arrow batch; and a negative header height (top-down pixel
    order per the BITMAPINFOHEADER spec) skips the bottom-up row
    flip so both orientations hash their true image."""
    import numpy as np
    meta = decode_image(payload)
    if meta is None or meta["format"] != "bmp" or meta["channels"] != 3:
        return None
    b = bytes(payload)
    w, h = meta["width"], meta["height"]
    data_off = struct.unpack_from("<I", b, 10)[0]
    raw_h = struct.unpack_from("<i", b, 22)[0]   # sign = row order
    stride = (w * 3 + 3) & ~3
    if data_off < 14 or data_off + stride * h > len(b):
        return None                              # truncated payload
    img = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)
    if raw_h > 0:                                # bottom-up storage
        img = img[::-1]
    img = img[:, :w * 3].reshape(h, w, 3)
    gray = img.sum(axis=2, dtype=np.int32)          # (h, w) channel sums
    ys = [gy * h // DHASH_ROWS for gy in range(DHASH_ROWS)]
    xs = [gx * w // DHASH_COLS for gx in range(DHASH_COLS)]
    grid = gray[np.ix_(ys, xs)]                     # (16, 9)
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64)  # (16, 8)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    h1 = int((bits[:8] * weights).sum(dtype=np.uint64).astype(np.int64))
    h2 = int((bits[8:] * weights).sum(dtype=np.uint64).astype(np.int64))
    return h1, h2


def image_dhashes(packed: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing over mapInPandas:
    (doc_id, payload) → (doc_id, h1, h2); non-BMP payloads yield
    nulls.  One Python pass per image — everything downstream of the
    hash (banding, candidate join, hamming verify) stays JVM-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = pdf["payload"].map(dhash_bmp)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "h1": hashes.map(
                    lambda t: t[0] if t is not None else None),
                "h2": hashes.map(
                    lambda t: t[1] if t is not None else None),
            })

    from greenplum_dwh_spark.shipping import ensure_shipped
    ensure_shipped(packed.sparkSession)
    return packed.select("doc_id", "payload").mapInPandas(
        run, DHASH_SCHEMA)
