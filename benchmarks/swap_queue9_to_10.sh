#!/bin/bash
# One-shot supervisor: retire queue9 cleanly and start queue10.
#
# Queue9's soak job is running; /tmp/cpu_busy.flag is already set, so
# after the soak's log auto-commit lands, queue9's run() for the next
# job parks in busywait (30s polls, no child job running). This script
# waits for that commit, kills queue9 by its EXACT recorded pid
# (releasing the flock), clears the flag, and launches queue10 — whose
# first job is the fault-aware soak rerun. Never edits the live queue9
# script (round-4 finding: a live bash re-reads edited scripts at
# arbitrary byte offsets).
# Usage: nohup bash benchmarks/swap_queue9_to_10.sh > /tmp/swap_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
Q9=$(cat /tmp/queue9.pid)
echo "=== swap supervisor: waiting for soak_bmulti commit (q9 pid $Q9) ==="
for _ in $(seq 480); do
  if git log --oneline -30 | grep -q "TPU queue result: soak_bmulti "; then
    break
  fi
  # queue9 already gone (e.g. finished or died): just proceed
  kill -0 "$Q9" 2>/dev/null || break
  sleep 15
done
if ps -p "$Q9" -o cmd= 2>/dev/null | grep -q run_tpu_queue9; then
  echo "killing queue9 pid $Q9 (parked in busywait)"
  kill "$Q9" 2>/dev/null
  sleep 2
fi
rm -f /tmp/cpu_busy.flag
nohup bash benchmarks/run_tpu_queue10.sh > /tmp/tpu_queue10.log 2>&1 &
echo $! > /tmp/queue10.pid
echo "queue10 launched pid $(cat /tmp/queue10.pid) $(date)"
