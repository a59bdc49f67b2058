"""Scaling probe: run bench.py at two scale factors and print the
per-query ratio table (the BASELINE.md round-3 format).

Usage:
    python scripts/make_sf_big.py            # once, builds .bigdata/sf1
    python scripts/scale_probe.py [small_dir] [big_dir]

Defaults: /root/testdata/sf0.1 vs /root/repo/.bigdata/sf1.  Each bench
runs in its own subprocess (fresh JVM — cross-run cache/GC state would
otherwise contaminate the comparison).  Queries whose ratio exceeds
~3× per 10× data get flagged as data-bound: at this scale most
queries are fixed-cost dominated, so anything above that is growing
with data and worth explaining — compare the ratio against the data
factor itself to call it superlinear (round 3 caught a 16 GB array
shuffle whose ratio was 30× for 10× data this way).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# run as `python scripts/scale_probe.py`, sys.path gets scripts/, not
# the repo root — bench.py (MAP_ONLY_CONTROLS) lives at the root
sys.path.insert(0, REPO)


#: non-headline queries that still get probe rows (round-8 verdict
#: item 5): the 10-stage curation funnel is deliberately not a
#: headline kernel (11 s composition of already-benched stages), but
#: its checkpoint-chain cost under 10× data is exactly what the probe
#: exists to measure
EXTRA_PROBE_QUERIES = "curation_funnel_counts"


def bench(sf_dir: str, retries: int = 2,
          max_controls_median: float = 1.25) -> dict:
    """One fresh-JVM bench leg.  The sf0.1 leg self-adjudicates
    against the committed calm pin (round 9): when its map-only
    control median reads > ``max_controls_median`` the leg was
    burst-inflated (host steal on zero-exchange plans) and is
    RETRIED after a load drain — the mechanical version of the
    'which run was calm' call that round-8/9 probe runs kept needing
    by hand (three same-code runs flagged three disjoint query
    sets).  The big leg has no pin; its honesty signal is the
    committed artifact's host stamps + round-over-round comparison."""
    for attempt in range(retries + 1):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_EXTRA=EXTRA_PROBE_QUERIES)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True,
            check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        cm = (r.get("vs_pin") or {}).get("controls_median")
        if cm is not None and cm > max_controls_median \
                and attempt < retries:
            print(f"scale_probe: {sf_dir} leg burst-inflated "
                  f"(controls_median {cm}); draining + retrying",
                  file=sys.stderr, flush=True)
            wait_load_drain()
            continue
        break
    # band_guard/ppjoin moved OFF bench.py's stdout line into the
    # sidecar in round 7 (the driver's tail capture had truncated the
    # headline total); read the sidecar HERE, before the next bench
    # run overwrites it — the sf1 artifact must keep carrying the
    # guard observables (a recall-losing cap change at sf1 has to be
    # visible in the ratio record, round-3/4 verdict requirement)
    with open(os.path.join(REPO, "BENCH_observables.json")) as f:
        side = json.load(f)
    r["band_guard"] = side.get("band_guard", {})
    r["ppjoin"] = side.get("ppjoin", {})
    return r


def wait_load_drain(threshold: float = 1.5,
                    max_wait_s: int = 600) -> None:
    """Block until load_1m drops under ``threshold`` (or the cap) —
    the small leg's own 32-thread load otherwise bleeds into the big
    leg's first queries and shows up as a phantom super-linear ratio
    (round 9: two same-code probe runs flagged disjoint query sets,
    q3_segment_revenue read 1.65× then 3.72× with the big leg
    starting at load 5.9)."""
    import time
    waited = 0
    while waited < max_wait_s:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(30)
        waited += 30
    print(f"scale_probe: load never drained under {threshold} "
          f"in {max_wait_s}s; proceeding", file=sys.stderr)


def big_controls_median(small: dict, big: dict) -> float | None:
    """The big leg's burst detector (round-9 verdict item 2): median
    over the map-only control queries of big_wall / small_wall.  The
    controls are fixed-cost-to-mildly-scan-bound across the decade
    (calm runs read ~1.0-1.5 per control, median ~1.3), so a median
    well above that means host steal inflated the big leg — exactly
    the signature of the r09 artifact (burst median ~2.0 while no
    flagged query's plan had changed)."""
    import statistics
    from bench import MAP_ONLY_CONTROLS
    rs = [big["queries"][c] / small["queries"][c]
          for c in MAP_ONLY_CONTROLS
          if small["queries"].get(c) and big["queries"].get(c)]
    return round(statistics.median(rs), 2) if rs else None


#: big-leg retry trigger: calm medians read ~1.3 (two scan-bound
#: controls ~1.5, two flat ~1.0-1.25); the r09 burst leg read ~2.0
BIG_CONTROLS_MAX = 1.6


def _flags(small: dict, big: dict) -> tuple[dict, list]:
    ratios, flagged = {}, []
    for k, va in small["queries"].items():
        vb = big["queries"].get(k)
        if vb is None:
            continue
        ratio = vb / va if va else float("inf")
        ratios[k] = round(ratio, 2)
        if ratio > 3.0:
            flagged.append(k)
    return ratios, flagged


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(REPO, ".bigdata/sf1")
    a = bench(small)
    # TWO big-leg attempts always (the r09 verdict's 'a flag list
    # that survives two consecutive runs'), a third when both read
    # burst-inflated; the CALMEST attempt becomes the artifact and
    # every attempt's adjudication fields ride along
    attempts: list[dict] = []
    while True:
        wait_load_drain()
        bi = bench(big)
        bi["big_controls_median"] = big_controls_median(a, bi)
        _, bi["flagged_over_3x"] = _flags(a, bi)
        attempts.append(bi)
        cms = [x["big_controls_median"] for x in attempts]
        if len(attempts) < 2:
            continue
        if len(attempts) < 3 and all(
                c is not None and c > BIG_CONTROLS_MAX for c in cms):
            print(f"scale_probe: both big legs burst-inflated "
                  f"(big_controls_median {cms}); one more attempt",
                  file=sys.stderr, flush=True)
            continue
        break
    b = min(attempts,
            key=lambda x: x["big_controls_median"] or float("inf"))
    print(f"{'query':32s} {'small':>7s} {'big':>8s} {'ratio':>6s}")
    ratios, flagged = _flags(a, b)
    for k, va in a["queries"].items():
        if k not in ratios:
            continue
        mark = "  <-- data-bound (check vs data factor)" \
            if ratios[k] > 3.0 else ""
        print(f"{k:32s} {va:7.2f} {b['queries'][k]:8.2f} "
              f"{ratios[k]:6.1f}{mark}")
    print(f"{'TOTAL':32s} {a['value']:7.2f} {b['value']:8.2f} "
          f"{b['value'] / a['value']:6.1f}")
    if flagged:
        print("flagged:", ", ".join(flagged))
    # machine-checkable sf1 artifact (round-3 verdict item 9): the
    # big-scale bench JSON + per-query ratios, committed alongside the
    # BENCH_r{N} records so round-over-round sf1 comparisons don't
    # depend on prose tables in BASELINE.md
    artifact = dict(b)
    artifact["small_sf"] = a["sf"]
    artifact["small_total"] = a["value"]
    # rider queries inflate the raw totals (the funnel alone is ~12 s
    # small / ~30 s big), so round-over-round total comparisons use
    # the HEADLINE-ONLY totals recorded here
    riders = [x.strip() for x in EXTRA_PROBE_QUERIES.split(",")
              if x.strip()]
    artifact["rider_queries"] = riders
    artifact["small_total_headline"] = round(
        a["value"] - sum(a["queries"].get(x, 0) for x in riders), 3)
    artifact["value_headline"] = round(
        b["value"] - sum(b["queries"].get(x, 0) for x in riders), 3)
    # the small leg's own burst adjudication (vs the committed pin)
    # and both legs' per-query load summaries ride the artifact, so
    # a reader can judge each leg's calm-ness without re-deriving it
    artifact["small_vs_pin"] = a.get("vs_pin")
    artifact["small_load"] = a.get("load")
    artifact["big_load"] = b.get("load")
    artifact["ratios_vs_small"] = ratios
    artifact["flagged_over_3x"] = flagged
    # every big attempt's adjudication fields, plus the flag-list
    # intersection across attempts — a flagged query that does NOT
    # survive both runs is noise (the r09 signature: four same-code
    # attempts flagged four disjoint sets), one that does is real
    artifact["big_attempts"] = [
        {"big_controls_median": x["big_controls_median"],
         "value": x["value"], "load": x.get("load"),
         "flagged_over_3x": x["flagged_over_3x"]}
        for x in attempts]
    stable = set(attempts[0]["flagged_over_3x"])
    for x in attempts[1:]:
        stable &= set(x["flagged_over_3x"])
    artifact["flagged_stable"] = sorted(stable)
    # when the big scale actually LOST rows, grade the recall loss
    # instead of only counting it (round-4 verdict item 2): the
    # estimator samples the dropped buckets and reports est_pairs_lost
    # + a recall floor, merged into the same band_guard record.  Since
    # the round-7 hot-band split, dropped_rows is the STAGE-2 residual
    # (rerouted memberships are not losses), so this triggers exactly
    # when the plan can actually miss pairs.  sim is assigned back
    # into the artifact explicitly: .get's detached {} default would
    # otherwise swallow the probe results.
    bg = artifact.setdefault("band_guard", {})
    sim = bg.setdefault("dedup_simhash", {})
    if sim.get("dropped_rows", 0) > 0:
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts/simhash_recall_probe.py"), big],
            cwd=REPO, capture_output=True, text=True, check=True)
        probe = json.loads(out.stdout.strip().splitlines()[-1])
        sim.update(probe)
        print("simhash recall probe:", probe)
    out_path = os.path.join(REPO, "BENCH_sf1.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
