"""Run the simhash band-guard recall estimator against one scale dir
and print ONE JSON line (the dict simhash_band_guard_probe returns).

Usage: python scripts/simhash_recall_probe.py [sf_dir] [sample_mod]

Invoked by scripts/scale_probe.py whenever the sf1 bench records
band-guard drops for dedup_simhash, so BENCH_sf1.json carries a
measured recall bound for the cap's trade instead of only a drop count
(round-4 verdict item 2).  Runs in its own process/JVM like the bench
runs it wraps.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sample_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from greenplum_dwh_spark.operators import dedup
    from greenplum_dwh_spark.session import get_spark
    spark = get_spark("simhash_recall_probe",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    probe = dedup.simhash_band_guard_probe(
        dedup._docs(spark, sf_dir), sample_mod=sample_mod)
    print(json.dumps(probe))


if __name__ == "__main__":
    main()
