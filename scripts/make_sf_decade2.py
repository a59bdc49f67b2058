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

Only documents.parquet is written — the decade-2 probe
(scripts/decade2_probe.py) runs only the two document-bound queries.

Usage: python scripts/make_sf_decade2.py [K] [src_dir] [out_dir]
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


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else \
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


if __name__ == "__main__":
    main()
