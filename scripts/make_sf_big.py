"""Derive a larger scale factor from /root/testdata/sf0.1 for the
scaling probe (no sf1 driver data exists; BASELINE.md records the
per-query sf1/sf0.1 ratios this enables).

Replication design (K copies, default 10):

- fact tables get per-replica key offsets so join fan-out per dim row
  scales K x, matching how TPC-H scale factors behave (lineitem /
  orders share the orderkey offset so their join lines up);
- events shift user_id too (users grow with data in any real corpus);
- documents rotate replica i's letters by i (``translate`` with a
  shifted alphabet): a bijection on CHARACTERS preserves each
  replica's internal near-dup structure exactly — for word shingles
  AND char n-grams — while making cross-replica grams disjoint.
  (The first probe used per-word ``r{i}`` prefixes, which separate
  word grams but NOT char grams: char-gram document frequencies grew
  10×, and the char-jaccard prefix join's Σ df² work grew ~100× — an
  artifact of the derivation, not the operator);
- embeddings shift vec_id AND apply a per-replica seeded signed
  permutation of the 64 dimensions (round 8; the transform and its
  honesty argument live in make_sf_decade2.signed_perm_expr — same
  seed family, so sf1's vectors are exactly the first 10 replicas of
  the decade-2 sf10 build).  The original vec_id-only replication
  left K IDENTICAL copies of every vector: near-dup pairs then grow
  quadratically in K by construction, which poisons any probe of
  whether the IMPLEMENTATION scales linearly.  Query vectors
  vec_id < 8 stay unique (replica 0 is the identity transform);
- dimension tables are copied as-is.

Usage: python scripts/make_sf_big.py [K] [out_dir]
Defaults: K=10, out_dir=/root/repo/.bigdata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bigdata/sf1"
    from greenplum_dwh_spark.session import get_spark
    spark = get_spark("make_sf_big",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def src(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def write(df, t):
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(t, "rows:", spark.read.parquet(f"{out_dir}/{t}.parquet").count(),
              flush=True)

    def replicate(t, shifts, transform=None):
        base = src(t)
        parts = []
        for i in range(k):
            df = base
            for col in shifts:
                df = df.withColumn(col, F.col(col) + F.lit(i * OFFSET))
            if transform is not None:
                df = transform(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out.repartition(32), t)

    for t in ["region", "nation", "customer", "supplier", "part"]:
        write(src(t), t)

    replicate("orders", ["o_orderkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("events", ["event_id", "user_id"])

    alphabet = "abcdefghijklmnopqrstuvwxyz"

    def rotate_chars(df, i):
        if i == 0:
            return df
        rotated = alphabet[i:] + alphabet[:i]
        return df.withColumn("text",
                             F.translate("text", alphabet, rotated))

    replicate("documents", ["doc_id"], rotate_chars)

    from scripts.make_sf_decade2 import signed_perm_expr

    def perm_embedding(df, i):
        if i == 0:
            return df
        return df.withColumn("embedding", signed_perm_expr(i))

    replicate("embeddings", ["vec_id"], perm_embedding)
    print("done:", out_dir)


if __name__ == "__main__":
    main()
