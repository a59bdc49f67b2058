"""Third-decade fuzzy-matching probe (round-6 verdict item 6, the
named decade-3 insurance evidence): time ``fuzzy_doc_pairs`` at sf3 /
sf10 / sf30 — two overlapping 10× decades reaching 3× past the
measured decade-2 — and QUANTIFY the one quantity the round-5/6
verdicts flagged as the growth risk: the PassJoin segment-hash key's
document frequency.  The blocking key (lang, blk, i, seg) has a fixed
universe per block, so its per-key df grows linearly with block
membership and the within-block candidate volume grows with
df_index × df_probe; the probe records

- ``best_sec`` per scale (fresh JVM, best-of-2 — bench.py discipline)
- ``seg_df``: index-side rows / distinct keys / max & mean per-key df
  for the over-split blocks' segment table
- ``cand_volume``: Σ_key df_index · df_probe — the exact size of the
  segment join's output before the verify filters

so the decade ratio can be read NEXT TO the df growth it is supposed
to survive.  A wall ratio tracking ~the data factor while max-df
grows 10× is the "9.0× holds" witness; a superlinear wall names the
minhash-band blocking-key rework as the next fix.

Writes BENCH_decade3.json.

Usage:
    python scripts/make_sf_decade2.py 30  /root/testdata/sf0.1 .bigdata/sf3
    python scripts/make_sf_decade2.py 300 /root/testdata/sf0.1 .bigdata/sf30
    python scripts/decade3_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = {"sf3": os.path.join(REPO, ".bigdata/sf3"),
          "sf10": os.path.join(REPO, ".bigdata/sf10"),
          "sf30": os.path.join(REPO, ".bigdata/sf30")}
MEM = {"sf3": "16g", "sf10": "48g", "sf30": "96g"}


def seg_df_stats(spark, sf_dir: str) -> dict:
    """df profile of the PassJoin segment join key at this scale —
    computed from the SAME routing fuzzy_doc_pairs uses (over-split
    blocks only), aggregates driver-side are O(1) rows."""
    from pyspark.sql import functions as F

    from greenplum_dwh_spark.operators.training_data import (
        _FUZZY_SEGS, _fuzzy_docs, FUZZY_BLOCK_SPLIT, FUZZY_PREFIX)
    d = _fuzzy_docs(spark, sf_dir)
    big_keys = (d.groupBy("lang", "blk").count()
                .filter(F.col("count") > FUZZY_BLOCK_SPLIT))
    big = (d.join(big_keys.select("lang", "blk"), ["lang", "blk"],
                  "semi")
           .filter(F.length("pre") == FUZZY_PREFIX))
    segs = big.select(
        "lang", "blk",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("i"),
                     F.substring("pre", s, ln).alias("seg"))
            for i, s, ln in _FUZZY_SEGS])).alias("x")
    ).select(F.xxhash64("lang", "blk", F.col("x.i"), F.col("x.seg"))
             .alias("k"))
    df_tab = segs.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    row = df_tab.agg(F.count(F.lit(1)).alias("n_keys"),
                     F.sum("df").alias("index_rows"),
                     F.max("df").alias("max_df"),
                     F.avg("df").alias("mean_df"),
                     # Σ df² bounds the segment join's same-key output
                     # (probe-side df tracks index-side df × window)
                     F.sum(F.col("df") * F.col("df"))
                     .alias("sum_df_sq")).first()
    nb = big_keys.agg(F.count(F.lit(1)).alias("n"),
                      F.max("count").alias("max_members")).first()
    return {"n_big_blocks": int(nb["n"] or 0),
            "max_block_members": int(nb["max_members"] or 0),
            "n_keys": int(row["n_keys"] or 0),
            "index_rows": int(row["index_rows"] or 0),
            "max_df": int(row["max_df"] or 0),
            "mean_df": round(float(row["mean_df"] or 0.0), 2),
            "sum_df_sq": int(row["sum_df_sq"] or 0)}


def inner(sf_dir: str) -> None:
    from greenplum_dwh_spark.operators.training_data import fuzzy_doc_pairs
    from greenplum_dwh_spark.session import get_spark
    spark = get_spark("decade3_probe",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .write.mode("overwrite").format("noop").save()
    # n_pairs rides an Observation on the second timed run — a
    # separate .count() would re-execute the entire segment join a
    # third time (+~50% probe wall at sf30) just for the row count
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    best, obs = float("inf"), None
    for i in range(2):
        df = fuzzy_doc_pairs(spark, sf_dir)
        if i == 1:
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    n_pairs = int(dict(obs.get)["n"])
    from bench import host_load
    print(json.dumps({"best_sec": round(best, 3), "n_pairs": int(n_pairs),
                      "seg_df": seg_df_stats(spark, sf_dir),
                      "host": host_load()}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        inner(sys.argv[2])
        return
    artifact: dict = {"query": "fuzzy_doc_pairs", "scales": {}}
    for label, sf_dir in SCALES.items():
        env = dict(os.environ, SPARK_DRIVER_MEM=MEM[label])
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", sf_dir],
            cwd=REPO, env=env, capture_output=True, text=True, check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        artifact["scales"][label] = r
        print(label, r, flush=True)
    s = artifact["scales"]
    artifact["ratio_sf3_sf30"] = round(
        s["sf30"]["best_sec"] / s["sf3"]["best_sec"], 2)
    artifact["ratio_sf10_sf30"] = round(
        s["sf30"]["best_sec"] / s["sf10"]["best_sec"], 2)
    out_path = os.path.join(REPO, "BENCH_decade3.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
