"""Simulate the driver's correctness pass: run every queries() entry
at sf0.01 with its DuckDB oracle, timing each, in registration order.

Usage: python scripts/driver_sim.py [sf_dir]
Prints per-query wall seconds (spark + oracle) and pass/fail, then a
total — the number that decides whether the driver's global budget
truncates the tail of the query list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def counts() -> dict:
    """Single source of truth for the surface counts quoted in
    README.md / COVERAGE.md (round-3 verdict item 8: the numbers were
    drifting across three hand-edited places).  Regenerate with
    ``python scripts/driver_sim.py --counts`` and paste once."""
    import __spark_entry__ as e
    import bench
    qs, oracles = e.queries(), e.oracle_sql()
    out = {"queries": len(qs), "oracles": len(oracles),
           "no_oracle": len(qs) - len(oracles),
           "bench_headline": len(bench.bench_queries())}
    # pytest collect count rides the same ledger (round-10 verdict
    # item 4: README/COVERAGE drifted to 375/380 against an actual
    # 382) — cheap enough to always include
    import subprocess
    try:
        cp = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q",
             "tests/"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for line in cp.stdout.splitlines():
            if line.endswith("tests collected") or " tests collected" in line:
                out["tests_collected"] = int(line.split()[0])
                break
    except Exception:
        out["tests_collected"] = None
    return out


def main() -> None:
    if "--counts" in sys.argv:
        print(json.dumps(counts()))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from greenplum_dwh_spark.plans.parity import compare
    from greenplum_dwh_spark.session import get_spark

    spark = get_spark("driver_sim", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = e.queries(), e.oracle_sql()
    results, total = {}, 0.0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            if name in oracles:
                r = compare(fn(spark, sf_dir), oracles[name], sf_dir)
                ok, detail = r["ok"], r["detail"]
            else:
                n = fn(spark, sf_dir).count()
                ok, detail = n >= 0, f"rows_only n={n}"
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"EXC {exc}"[:200]
        dt_s = time.time() - t0
        total += dt_s
        results[name] = round(dt_s, 2)
        print(f"{dt_s:7.2f}s  {'PASS' if ok else 'FAIL'}  {name}"
              + ("" if ok else f"  {detail}"), flush=True)
    print(json.dumps({"total_s": round(total, 1), "queries": results}))


if __name__ == "__main__":
    main()
