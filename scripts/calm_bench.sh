#!/bin/bash
# Run the round's three benchmark surfaces back-to-back, but only
# START once the host is genuinely calm (load_1m < 1.0 for two
# consecutive checks 60 s apart) — the round-8 host showed multi-hour
# co-tenant bursts (3% steal, load 10+ while locally idle) that
# contaminated every afternoon artifact.  Waits up to MAX_WAIT_MIN.
set -u
cd "$(dirname "$0")/.."
MAX_WAIT_MIN=${MAX_WAIT_MIN:-120}
calm_streak=0
waited=0
while [ "$calm_streak" -lt 2 ]; do
  l1=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$l1') < 1.0 else 1)"; then
    calm_streak=$((calm_streak + 1))
  else
    calm_streak=0
  fi
  sleep 60
  waited=$((waited + 1))
  if [ "$waited" -ge "$MAX_WAIT_MIN" ]; then
    echo "calm_bench: gave up waiting (last load_1m=$l1)" >&2
    exit 1
  fi
done
echo "calm_bench: starting at load $(cat /proc/loadavg)"
python scripts/scale_probe.py 2>&1 | tail -80
echo "calm_bench: scale probe done, load $(cat /proc/loadavg); cooling 120s"
sleep 120
python bench.py --pin 2>/dev/null | tail -1
echo "calm_bench: pin done, load $(cat /proc/loadavg); cooling 120s"
sleep 120
python bench_streaming.py 2>&1 | tail -2
echo "calm_bench: all done, load $(cat /proc/loadavg)"
