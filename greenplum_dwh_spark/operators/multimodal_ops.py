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
                                                  image_dhashes,
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


#: image near-dup contract: pairs within hamming PHASH_MAX_DIST of
#: the 128-bit dHash.  8 LSH bands of 16 bits over the two packed
#: halves — pigeonhole-complete for distance ≤ 7 (two fingerprints
#: ≤ 7 bits apart agree on ≥ 1 of 8 bands), so detection at dist 6
#: is EXACT and the DuckDB brute-force twin is a true oracle.
PHASH_MAX_DIST = 6
PHASH_BAND_BITS = 16
#: planted near-dup twins: every 50th doc long enough for ≥ 8 BMP
#: rows gets a copy with its LAST character swapped — one byte moves
#: one grayscale cell, sampled by ≤ 2 of the 16 grid rows at h ≥ 8,
#: so the twin sits ≤ 4 bits from its original (≤ PHASH_MAX_DIST by
#: construction; 0 when the changed cell misses the sampled grid).
PHASH_TWIN_MOD = 50
PHASH_TWIN_MIN_BYTES = 384
PHASH_TWIN_OFFSET = 1_000_000_000


def _planted_image_docs(t: Tables) -> DataFrame:
    """documents ∪ perturbed twins — the planted ground truth for
    image near-dup dedup (the shared plant-then-operate discipline:
    the corpus has no image assets, so near-duplicate images are
    constructed deterministically and the oracle replays the plant)."""
    base = t.documents.select("doc_id", "text")
    twin_ch = (F.when(F.expr("right(text, 1)") == "Z", F.lit("Y"))
               .otherwise(F.lit("Z")))
    twins = (base
             .filter((F.col("doc_id") % PHASH_TWIN_MOD == 0)
                     & (F.octet_length("text") >= PHASH_TWIN_MIN_BYTES))
             .select((F.col("doc_id") + F.lit(PHASH_TWIN_OFFSET))
                     .alias("doc_id"),
                     F.concat(F.expr("substring(text, 1, length(text)-1)"),
                              twin_ch).alias("text")))
    return base.unionByName(twins)


def _phash_bands(fps: DataFrame) -> DataFrame:
    """(doc_id, band) rows from a (doc_id, h1, h2) hash table —
    8×16-bit hamming bands, shared by the candidate join and the
    recall probe (the simhash discipline: the probe grades the join
    the operator actually runs)."""
    mask = (1 << PHASH_BAND_BITS) - 1
    keys = [
        F.concat_ws(":", F.lit(str(i * 4 + b)),
                    F.shiftrightunsigned(F.col(col), PHASH_BAND_BITS * b)
                    .bitwiseAND(mask).cast("string"))
        for i, col in enumerate(("h1", "h2")) for b in range(4)]
    return (fps.filter(F.col("h1").isNotNull())
            .select("doc_id", F.explode(F.array(*keys)).alias("band")))


def _phash_hamming(a_prefix: str = "a", b_prefix: str = "b"):
    """hamming(h1_a,h2_a ; h1_b,h2_b) as a JVM column expression."""
    return (F.bit_count(F.col(f"h1_{a_prefix}")
                        .bitwiseXOR(F.col(f"h1_{b_prefix}")))
            + F.bit_count(F.col(f"h2_{a_prefix}")
                          .bitwiseXOR(F.col(f"h2_{b_prefix}"))))


def image_phash_pairs(docs: DataFrame,
                      max_dist: int = PHASH_MAX_DIST,
                      fps: DataFrame | None = None) -> DataFrame:
    """Perceptual-hash image near-dup: (doc_id, text)-shaped docs →
    (doc_a, doc_b, hamming) pairs whose 128-bit BMP dHashes are
    within ``max_dist``.

    Plan: ONE Arrow pass packs each doc into a real 24-bit BMP and
    dHashes the pixel grid (:func:`codec.image_dhashes` — the only
    Python stage); the candidate join is the simhash hamming-band
    machinery over 8×16-bit bands (hot-bucket guard + observables,
    and the hot-band SPLIT once any bucket passes the cap), and the
    verify predicate is JVM-side ``bit_count(xor)`` per half.
    Plain banding is pigeonhole-complete for ``max_dist`` ≤ 7; the
    composite hot-split re-key is complete for ``max_dist`` ≤ 6
    (n_bands − 2, both endpoints share the hot band) — the default
    contract distance, so recall stays EXACT through band
    saturation.  Saturation is real, not hypothetical: at sf1,
    structured gradient patterns (alternating-bit bands like 0xAAAA
    from short repeated-row images) put >6k docs in one 16-bit
    bucket — the round-10 probe caught the plain guard dropping 27k
    memberships there, and the split reroutes them instead.  At
    ``max_dist`` 7 the split would silently lose pairs, so it
    auto-falls back to the plain drop guard (drops observed, never
    unobserved recall loss — the simhash rule).  At 100 TB: band
    keys are 16-bit over two int64 columns (16 bytes/doc through
    the band exchange — the hashed-paragraph posture: pixels never
    shuffle), and giant IDENTICAL-hash clusters (the only composite
    bucket that can still exceed the cap; sf1's largest is 24 docs)
    surface as observed stage-2 drops rather than silently
    quadratic output."""
    from greenplum_dwh_spark.operators import dedup as D
    if max_dist > 7:
        raise ValueError("8×16-bit banding is complete only for "
                         f"hamming ≤ 7, got {max_dist}")
    if fps is None:
        # ``fps`` lets the recall probe reuse its cached hash table
        # (the simhash fps= recipe) instead of paying a second
        # corpus pack+hash pass; the caller then owns the cache
        fps = image_dhashes(pack_image_payloads(docs, width=16)).cache()
    bands = _phash_bands(fps)
    # hotness decision: the simhash pigeonhole shortcut on the doc
    # count (memoized on the fingerprint plan) — only inside the
    # bounded window cap < n ≤ cap·2¹⁶ does the exact alphabet-
    # bounded size aggregate run
    hot = False
    if max_dist <= 6:  # composite re-key incomplete past n_bands − 2
        mkey = (fps.semanticHash(), D.BAND_CAP, "phash")
        hot = D._HOTNESS_MEMO.get(mkey)
        if hot is None:
            n = fps.count()
            if n <= D.BAND_CAP:
                hot = False
            elif n > D.BAND_CAP * (1 << PHASH_BAND_BITS):
                hot = True
            else:
                mx = (bands.groupBy("band")
                      .agg(F.count(F.lit(1)).alias("_bn"))
                      .agg(F.max("_bn")).first()[0]) or 0
                hot = mx > D.BAND_CAP
            D._HOTNESS_MEMO[mkey] = hot
            while len(D._HOTNESS_MEMO) > D._HOTNESS_MEMO_MAX:
                D._HOTNESS_MEMO.pop(next(iter(D._HOTNESS_MEMO)))
    # verify-then-distinct (the simhash ordering): the hamming check
    # is two XOR+popcounts against the doc-count-sized hash table,
    # and only the verified survivors pay the distinct shuffle
    if hot:
        cand = D._split_banded_candidates(bands, D.BAND_CAP)
    else:
        # pass the LIVE cap so the guard and the hotness decision
        # above can never disagree if BAND_CAP is retuned at runtime
        cand = D._banded_candidates(bands, D.BAND_CAP, distinct=False,
                                    expand="join")
    fa = fps.select(F.col("doc_id").alias("doc_a"),
                    F.col("h1").alias("h1_a"), F.col("h2").alias("h2_a"))
    fb = fps.select(F.col("doc_id").alias("doc_b"),
                    F.col("h1").alias("h1_b"), F.col("h2").alias("h2_b"))
    return (cand.join(fa, "doc_a").join(fb, "doc_b")
            .select("doc_a", "doc_b",
                    _phash_hamming().cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_dist)
            .distinct())


def image_phash_guard_probe(docs: DataFrame,
                            max_dist: int = PHASH_MAX_DIST,
                            band_cap: int | None = None,
                            sample_mod: int = 4,
                            count_emitted: bool = True) -> dict:
    """Grade the phash split plan's residual recall loss instead of
    only counting dropped memberships — the
    :func:`dedup.simhash_band_guard_probe` estimator ported to the
    two-half hash: deterministically sample docs at 1/``sample_mod``,
    take sampled-member pairs within over-cap RAW buckets, verify
    hamming exactly, then subtract pairs the production plan still
    emits — via an under-cap raw band (``escaped``) or an under-cap
    composite bucket of the SAME :func:`dedup._split_routing` the
    operator runs (``rescued``).  A lost pair is sampled with
    probability 1/mod² regardless of how many hot buckets it shares,
    so ``sampled_lost · mod²`` is unbiased and
    :func:`dedup._binom_count_ub` turns the count into a 95% upper
    bound (a sampled zero is not a bound of zero).  Work is
    O(Σ hot_bucket²/mod²) — a diagnostics pass over exactly the
    buckets the plan refuses to join."""
    from pyspark.sql import Window

    from greenplum_dwh_spark.operators import dedup as D
    band_cap = D.BAND_CAP if band_cap is None else band_cap
    fps = (image_dhashes(pack_image_payloads(docs, width=16))
           .filter(F.col("h1").isNotNull()).cache())
    bands = _phash_bands(fps)
    w = Window.partitionBy("band")
    counted = bands.withColumn("_bn", F.count(F.lit(1)).over(w)).cache()
    hot = counted.filter(F.col("_bn") > band_cap)
    stats = counted.agg(
        F.sum(F.when(F.col("_bn") > band_cap, 1).otherwise(0))
        .alias("raw_overcap_rows"),
        F.max("_bn").alias("max_band_size")).first()
    out = {"raw_overcap_rows": int(stats["raw_overcap_rows"] or 0),
           "max_band_size": int(stats["max_band_size"] or 0),
           "sample_mod": sample_mod}
    sampled = (hot.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(sample_mod)) == 0)
        .select("doc_id", "band"))
    cand = (sampled.alias("a").join(sampled.alias("b"), "band")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    fa = fps.select(F.col("doc_id").alias("doc_a"),
                    F.col("h1").alias("h1_a"), F.col("h2").alias("h2_a"))
    fb = fps.select(F.col("doc_id").alias("doc_b"),
                    F.col("h1").alias("h1_b"), F.col("h2").alias("h2_b"))
    verified = (cand.join(fa, "doc_a").join(fb, "doc_b")
                .filter(_phash_hamming() <= max_dist)
                .select("doc_a", "doc_b"))
    cool = (counted.filter(F.col("_bn") <= band_cap)
            .select("doc_id", "band"))
    escaped = (verified
               .join(cool.select(F.col("doc_id").alias("doc_a"),
                                 "band"), "doc_a")
               .join(cool.select(F.col("doc_id").alias("doc_b"),
                                 "band"), ["doc_b", "band"])
               .select("doc_a", "doc_b").distinct())
    if max_dist <= 6:
        comp = (D._split_routing(bands, band_cap)[1]
                .withColumnRenamed("band", "ckey"))
        wc = Window.partitionBy("ckey")
        comp_cool = (comp.withColumn("_cn", F.count(F.lit(1)).over(wc))
                     .filter(F.col("_cn") <= band_cap)
                     .select("doc_id", "ckey"))
        rescued = (verified
                   .join(comp_cool.select(F.col("doc_id").alias("doc_a"),
                                          "ckey"), "doc_a")
                   .join(comp_cool.select(F.col("doc_id").alias("doc_b"),
                                          "ckey"), ["doc_b", "ckey"])
                   .select("doc_a", "doc_b").distinct())
    else:
        # mirror the operator's plan selection: past n_bands − 2 the
        # split is incomplete, image_phash_pairs falls back to the
        # plain drop guard, so crediting split-rescued pairs here
        # would overstate est_recall for a plan that never runs
        rescued = verified.limit(0)
    sampled_lost = (verified
                    .join(escaped, ["doc_a", "doc_b"], "left_anti")
                    .join(rescued, ["doc_a", "doc_b"], "left_anti")
                    .count())
    out["sampled_lost_pairs"] = int(sampled_lost)
    out["est_pairs_lost"] = int(sampled_lost * sample_mod * sample_mod)
    out["est_pairs_lost_ub"] = (
        0 if out["raw_overcap_rows"] == 0
        else D._binom_count_ub(int(sampled_lost),
                               1.0 / (sample_mod * sample_mod)))
    if count_emitted:
        emitted = image_phash_pairs(docs, max_dist, fps=fps).count()
        out["emitted_pairs"] = int(emitted)
        denom = emitted + out["est_pairs_lost"]
        out["est_recall"] = round(emitted / denom, 6) if denom else 1.0
        denom_ub = emitted + out["est_pairs_lost_ub"]
        out["est_recall_lb"] = (round(emitted / denom_ub, 6)
                                if denom_ub else 1.0)
    fps.unpersist()
    counted.unpersist()
    return out


def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection over the planted corpus — every
    (original, last-byte-perturbed twin) pair plus any natural
    hash-proximal pairs, exactly reproduced by the DuckDB brute-force
    oracle (same byte-level dHash arithmetic, all-pairs verify)."""
    return image_phash_pairs(_planted_image_docs(Tables(spark, sf_dir)))


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_decode": multimodal_decode,
    "multimodal_av": multimodal_av,
    "dedup_image_phash": dedup_image_phash,
}

# --- dedup_image_phash oracle: the dHash byte arithmetic in SQL ----------
# The BMP containers are deterministic (width 16, text bytes as BGR
# pixel rows of 48 bytes, zero-padded), so grayscale cell (x, y) is
# the sum of text bytes y*48+3x .. +2 (0 beyond the text) and the
# whole 128-bit hash is integer arithmetic DuckDB replays exactly.
# Sampled columns gx*16//9 for the 9-column grid:
_PHASH_XS = [0, 1, 3, 5, 7, 8, 10, 12, 14]


def _phash_byte(idx: str) -> str:
    """SQL byte value at 0-based payload index ``idx`` (0 past EOF)."""
    return (f"CASE WHEN ({idx}) < n THEN "
            f"('0x' || substr(hx, 2*({idx})+1, 2))::INT ELSE 0 END")


#: 16×9 grayscale grid (channel sums), rows sampled gy*h//16:
_PHASH_GRID = (
    "list_transform(range(0, 16), gy -> "
    f"list_transform({_PHASH_XS}, x -> "
    + " + ".join(_phash_byte(f"((gy*h)//16)*48 + 3*x + {c}")
                 for c in range(3))
    + "))")


def _phash_quarter(rbase: int) -> str:
    """32 gradient bits from grid rows rbase..rbase+3 (0-based),
    packed little-endian as a BIGINT (shifts ≤ 31 — sign-safe)."""
    return ("list_sum(flatten(list_transform(range(0, 4), r -> "
            "list_transform(range(0, 8), c -> "
            f"CASE WHEN grid[r+{rbase + 1}][c+2] > grid[r+{rbase + 1}][c+1] "
            "THEN (1::BIGINT << (r*8+c)::INT) "
            "ELSE 0::BIGINT END))))::BIGINT")


def _phash_half(row0: int) -> str:
    """int64 hash half from grid rows row0..row0+7: lo quarter +
    hi quarter · 2³², assembled in HUGEINT and wrapped to the same
    signed int64 the numpy kernel emits."""
    v = (f"(({_phash_quarter(row0)})::HUGEINT "
         f"+ ({_phash_quarter(row0 + 4)})::HUGEINT "
         "* 4294967296::HUGEINT)")
    return (f"(CASE WHEN {v} >= 9223372036854775808::HUGEINT "
            f"THEN {v} - 18446744073709551616::HUGEINT "
            f"ELSE {v} END)::BIGINT")


_PHASH_ORACLE = f"""
    WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {PHASH_TWIN_OFFSET},
               substr(text, 1, length(text) - 1)
                   || (CASE WHEN right(text, 1) = 'Z'
                            THEN 'Y' ELSE 'Z' END)
        FROM documents
        WHERE doc_id % {PHASH_TWIN_MOD} = 0
          AND strlen(text) >= {PHASH_TWIN_MIN_BYTES}),
    b AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n,
                 greatest(1, (strlen(text) + 47) // 48) AS h
          FROM src),
    g AS (SELECT doc_id, {_PHASH_GRID} AS grid FROM b),
    hs AS (SELECT doc_id, {_phash_half(0)} AS h1,
                  {_phash_half(8)} AS h2
           FROM g)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           (bit_count(xor(a.h1, b.h1))::INT
            + bit_count(xor(a.h2, b.h2))::INT) AS hamming
    FROM hs a JOIN hs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h1, b.h1))::INT
          + bit_count(xor(a.h2, b.h2))::INT <= {PHASH_MAX_DIST}"""


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
    "dedup_image_phash": _PHASH_ORACLE,
}
