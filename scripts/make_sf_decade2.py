"""Derive a documents-only second scaling decade (sf10) from sf0.1,
for the two genuinely data-bound queries (round-4 verdict item 3: one
probed decade can't distinguish linear candidate growth from
quadratic onset).

Replication design (K copies of sf0.1's documents, default 100):

- replica r applies ONE character injection to the text: a seeded
  random map (``random.Random(1000+r).sample``) of the 26 lowercase
  letters into the 62-symbol alphabet (lower + upper + digits).  A
  char injection preserves each replica's internal near-dup structure
  EXACTLY — for word-2-gram jaccard and for prefix edit distance
  alike — while any two replicas' maps agree on ~26/62 ≈ 0.4 letters
  in expectation, so cross-replica prefixes differ at essentially
  every position, the way genuinely new data behaves.  The build
  asserts the worst pair of maps shares ≤ 4 letters.

  (THREE earlier derivations failed the fuzzy probe's honesty and
  are kept on the record — the operator's 12-edits-in-40-chars
  threshold is loose enough that any structured transform family
  leaks: per-word ``q{r}`` suffixes left replicas one char per word
  apart (~6 edits → 1.8 M artifact pairs); rotation caps at 26
  distinct replicas, and composed rotations collide (i+3j mod 26);
  rotation+vowel-digits left same-rotation replicas differing only
  at vowel positions, ~12 per prefix — exactly the threshold.)

- word grams stay (near-)disjoint across replicas: any two replicas'
  char maps agree on ≤ 4 of the 26 letters (asserted at build), so
  essentially every word's image differs between replicas and a
  shared word 2-gram needs BOTH its words to collide; accidental
  cross-replica gram collisions between DIFFERENT base words are
  possible in principle but negligible (the jaccard probe's
  candidate observable verifies the ~linear growth directly);
- ``n_chars`` / ``lang`` are kept as-is: fuzzy_doc_pairs blocks on
  (lang, n_chars/8), and length-profile collisions growing linearly
  with corpus size is exactly the behavior the probe must include;
- doc_id shifts by r·10M.

EMBEDDINGS (round 8, for the embedding-family decade probe): replica
r applies a seeded SIGNED PERMUTATION of the 64 dimensions (seed
2000+r; r=0 is the identity).  A signed permutation is an orthogonal
transform realized as reorder+negate — it touches no float mantissa,
so within-replica inner products, norms, and therefore the entire
near-dup/ANN structure are preserved BIT-EXACTLY — while any two
replicas' relative transform is itself a random signed permutation,
collapsing cross-replica cosine below the near-dup regime (measured
max cross-replica cosine 0.615 over the full replica-0 ×
replicas-1..9 cross product at sf1 — comparable to the base corpus'
own organic max of 0.601, and far under the 0.85 threshold).  The
sf1 generator (make_sf_big.py) uses the SAME seed family and the
same 10M vec_id offset, so sf1's embeddings are literally the first
10 replicas of sf10's — the decade adds 90 fresh replicas.  (The
original sf1 replication shifted vec_id only, leaving 10 IDENTICAL
copies of every vector — a corpus where near-dup pairs grow
quadratically in K by construction, useless for grading whether the
IMPLEMENTATION scales linearly.)

By default documents.parquet and embeddings.parquet are both
written; ``--docs-only`` / ``--embeddings-only`` restrict the build
(the sf30 decade-3 corpus needs only documents; adding embeddings to
an existing sf10 shouldn't re-pay the 100-replica documents write).

Usage: python scripts/make_sf_decade2.py [K] [src_dir] [out_dir]
                                         [--docs-only|--embeddings-only]
Defaults: K=100, src=/root/testdata/sf0.1, out=/root/repo/.bigdata/sf10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OFFSET = 10_000_000
ALPHABET = "abcdefghijklmnopqrstuvwxyz"
SYMBOLS = ALPHABET + ALPHABET.upper() + "0123456789"


def target_alphabet(r: int) -> str:
    """The 26-char translate() image for seed r (see module doc)."""
    import random
    return "".join(random.Random(1000 + r).sample(SYMBOLS, 26))


def select_maps(k: int, max_shared: int = 4) -> list[str]:
    """Greedy map selection for arbitrary K (round-7, for the
    decade-3 fuzzy probe's sf30 build): walk the seed stream and skip
    any candidate sharing more than ``max_shared`` letters with an
    already-selected map.  At K ≤ 100 no seed is skipped (verified),
    so the maps — and therefore the sf10 dataset — are byte-identical
    to the original generator's; past ~150 maps the naive stream's
    worst pair crosses the honesty bound (measured: 5 shared at
    K=300) and the skip kicks in."""
    maps = [ALPHABET]
    seed = 1
    while len(maps) < k:
        cand = target_alphabet(seed)
        seed += 1
        if all(sum(a == b for a, b in zip(cand, m)) <= max_shared
               for m in maps):
            maps.append(cand)
    return maps


EMB_DIM = 64


def signed_perm(r: int) -> tuple[list[int], list[float]]:
    """Replica r's signed permutation of the EMB_DIM dimensions
    (seeded, deterministic; r=0 is the identity by convention of the
    caller)."""
    import random
    rng = random.Random(2000 + r)
    perm = list(range(EMB_DIM))
    rng.shuffle(perm)
    signs = [rng.choice((1.0, -1.0)) for _ in range(EMB_DIM)]
    return perm, signs


def signed_perm_expr(r: int):
    """Column expression applying replica r's signed permutation to
    ``embedding`` (array<float>).  Reorder + unary negation only —
    no float mantissa is touched, so the transform is exactly
    orthogonal in float arithmetic (see module doc)."""
    if r == 0:
        return F.col("embedding")
    perm, signs = signed_perm(r)
    terms = [("-" if s < 0 else "") + f"embedding[{p}]"
             for p, s in zip(perm, signs)]
    return F.expr("array(" + ", ".join(terms) + ")")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    unknown = flags - {"--docs-only", "--embeddings-only"}
    if unknown or flags == {"--docs-only", "--embeddings-only"}:
        raise SystemExit(f"bad flags: {sorted(flags)}")
    k = int(args[0]) if len(args) > 0 else 100
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out_dir = args[2] if len(args) > 2 else \
        "/root/repo/.bigdata/sf10"
    from greenplum_dwh_spark.session import get_spark
    spark = get_spark("make_sf_decade2",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    # honesty guard: the worst pair of replica maps must share few
    # letters, or cross-replica prefixes creep under the fuzzy
    # threshold (see module doc for the three failed designs).
    # select_maps enforces the bound by construction; the assert
    # re-checks it (and pins the K<=100 byte-compatibility: the greedy
    # walk skips nothing there, so sf10 regenerates identically)
    if "--embeddings-only" not in flags:
        maps = select_maps(k)
        worst = max(sum(a == b for a, b in zip(m1, m2))
                    for x, m1 in enumerate(maps)
                    for m2 in maps[x + 1:])
        assert worst <= 4, f"replica maps too close: share {worst} letters"
        if k <= 100:
            assert maps[1:] == [target_alphabet(r) for r in range(1, k)]
        base = spark.read.parquet(f"{src}/documents.parquet")
        parts = []
        for r in range(k):
            df = base.withColumn("doc_id",
                                 F.col("doc_id") + F.lit(r * OFFSET))
            if r > 0:
                df = df.withColumn(
                    "text", F.translate("text", ALPHABET, maps[r]))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite") \
            .parquet(f"{out_dir}/documents.parquet")
        n = spark.read.parquet(f"{out_dir}/documents.parquet").count()
        print("documents rows:", n, "->", out_dir)
    if "--docs-only" not in flags:
        ebase = spark.read.parquet(f"{src}/embeddings.parquet")
        eparts = []
        for r in range(k):
            eparts.append(ebase.select(
                (F.col("vec_id") + F.lit(r * OFFSET)).alias("vec_id"),
                signed_perm_expr(r).alias("embedding"),
                "label"))
        eout = eparts[0]
        for p in eparts[1:]:
            eout = eout.unionByName(p)
        eout.repartition(16).write.mode("overwrite") \
            .parquet(f"{out_dir}/embeddings.parquet")
        n = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
        print("embeddings rows:", n, "->", out_dir)


if __name__ == "__main__":
    main()
