"""Co-tenant steal detector (round 11): measure what loadavg cannot.

The round-11 decade-2 re-probe was discarded because the host entered
multi-minute co-tenant steal bursts that the probes' load-drain gates
could not see: every leg started at load_1m < 2.0, yet UNTOUCHED-code
legs varied 1.6x between adjacent runs and 4-15x across the evening
(BASELINE.md round-11 section).  Loadavg counts OUR runnable threads;
hypervisor steal takes cycles without queueing anything, so a gate on
loadavg passes straight into a burst.

This probe measures actual CPU throughput instead: a fixed
sha256-chase workload on 1 thread and on all cores (separate
processes — the GIL serializes threads), reported as iterations per
2-second window.  Protocol for a steal-gated measurement session:

1. ``python scripts/steal_probe.py --ref`` once on a believed-calm
   box (e.g. right after a bench run whose map-only controls read
   ~1.0) — writes /tmp/steal_ref.json.
2. ``python scripts/steal_probe.py --wait-calm [pct] [max_min]``
   before each measurement leg: blocks until BOTH throughputs are
   within ``pct`` (default 10) percent of the reference, giving up
   after ``max_min`` (default 30) minutes with exit code 1 so the
   caller can refuse the leg instead of measuring the host.
3. Re-run plain ``python scripts/steal_probe.py`` after each leg; a
   leg whose after-reading is degraded was measured IN a burst and
   should be discarded no matter what it read.

The workload is deterministic and steady-state (each iteration
allocates one fresh 4 KiB digest-chain buffer, so allocator/GC
throughput is part of what it measures — deliberately: a co-tenant
stealing memory bandwidth shows up too), so reference drift means
the HOST changed, not the probe.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

REF_PATH = "/tmp/steal_ref.json"
WINDOW_S = 2.0


def _spin(_arg: int = 0) -> int:
    h = b"x" * 4096
    t0 = time.time()
    n = 0
    while time.time() - t0 < WINDOW_S:
        h = hashlib.sha256(h).digest() * 128
        n += 1
    return n


def measure() -> dict:
    single = _spin()
    cpus = os.cpu_count() or 1
    with mp.Pool(cpus) as pool:
        multi = sum(pool.map(_spin, range(cpus)))
    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load = -1.0
    return {"single": single, "multi": multi, "cpus": cpus,
            "load_1m": load, "ts": round(time.time(), 1)}


def is_calm(ref: dict, now: dict, pct: float = 10.0) -> bool:
    """Both throughputs within ``pct`` percent BELOW the reference
    (readings above it are fine — the reference may itself carry
    residual steal).  Requiring both catches the two burst shapes
    seen in round 11: whole-box steal (single drops) and
    co-tenant core contention (multi drops while single survives
    on a free core).

    A reference taken at a different core count (another box, or a
    resized sandbox) would silently mis-scale the multi comparison —
    refuse it instead (round-11 ADVICE)."""
    if "cpus" in ref and "cpus" in now and ref["cpus"] != now["cpus"]:
        raise ValueError(
            f"steal_probe reference measured at cpus={ref['cpus']} but "
            f"this host has cpus={now['cpus']} — re-run --ref here")
    f = 1 - pct / 100
    return (now["single"] >= ref["single"] * f
            and now["multi"] >= ref["multi"] * f)


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--ref":
        m = measure()
        with open(REF_PATH, "w") as f:
            json.dump(m, f)
        print(json.dumps({"ref": m, "path": REF_PATH}))
        return 0
    if args and args[0] == "--wait-calm":
        pct = float(args[1]) if len(args) > 1 else 10.0
        max_min = float(args[2]) if len(args) > 2 else 30.0
        try:
            with open(REF_PATH) as f:
                ref = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError) as exc:
            # no (or corrupt) reference is a clean refusal, not a
            # traceback (round-11 ADVICE): the documented protocol is
            # --ref first on a believed-calm box
            print(f"steal_probe: no usable reference at {REF_PATH} "
                  f"({exc}) — run `steal_probe.py --ref` on a calm "
                  f"host first", file=sys.stderr)
            return 1
        t0 = time.time()
        while True:
            m = measure()
            try:
                ok = is_calm(ref, m, pct)
            except ValueError as exc:
                print(f"steal_probe: {exc}", file=sys.stderr)
                return 1
            print(json.dumps({"now": m, "calm": ok}), flush=True)
            if ok:
                return 0
            if time.time() - t0 > max_min * 60:
                print(f"steal_probe: not calm within {max_min} min — "
                      f"refuse the measurement leg", file=sys.stderr)
                return 1
            time.sleep(30)
    print(json.dumps(measure()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
