#!/bin/bash
# Run the round's three benchmark surfaces back-to-back, but only
# START once the host is genuinely calm (load_1m < 1.0 for two
# consecutive checks 60 s apart) — the round-8 host showed multi-hour
# co-tenant bursts (3% steal, load 10+ while locally idle) that
# contaminated every afternoon artifact.  Waits up to MAX_WAIT_MIN.
#
# Each step's exit status is checked (round-8 ADVICE: the old
# '2>/dev/null' swallowed pin_overwrite_guard refusals and crashes,
# then reported 'pin done' regardless); bench.py --pin's stderr goes
# to a log whose tail is surfaced on failure, and the script exits
# with the number of failed steps.
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
fails=0
echo "calm_bench: starting at load $(cat /proc/loadavg)"
python scripts/scale_probe.py 2>&1 | tail -80
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "calm_bench: WARNING scale_probe FAILED (rc=$rc)" >&2
  fails=$((fails + 1))
fi
echo "calm_bench: scale probe done (rc=$rc), load $(cat /proc/loadavg); cooling until calm"
# load-aware cooldown (round 10: a fixed 120 s left load_1m at 2.36
# right after the probe's 32-thread big legs and the pin gate refused)
cool=0
while [ "$cool" -lt 20 ]; do
  l1=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$l1') < 1.5 else 1)"; then
    break
  fi
  sleep 60
  cool=$((cool + 1))
done
pin_log=$(mktemp /tmp/calm_bench_pin.XXXXXX.log)
# PIN_ARGS: pass --pin-force for legitimate slower-pin cases
# (real code-cost or headline-set change — round 10 adds a query)
python bench.py --pin ${PIN_ARGS:-} 2>"$pin_log" | tail -1
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "calm_bench: WARNING bench.py --pin FAILED (rc=$rc); stderr tail:" >&2
  tail -5 "$pin_log" >&2
  fails=$((fails + 1))
else
  # surface the pin confirmation (or guard warnings) even on success
  grep -E "pinned ->|pin guard" "$pin_log" >&2 || true
fi
rm -f "$pin_log"
echo "calm_bench: pin done (rc=$rc), load $(cat /proc/loadavg); cooling 120s"
sleep 120
python bench_streaming.py 2>&1 | tail -2
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "calm_bench: WARNING bench_streaming FAILED (rc=$rc)" >&2
  fails=$((fails + 1))
fi
echo "calm_bench: all done, load $(cat /proc/loadavg), failed_steps=$fails"
exit "$fails"
