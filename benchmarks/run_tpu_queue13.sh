#!/bin/bash
# Round-5 TPU queue, pass 3 — closes the measurement tail:
#  - smoke_r5 rerun from a snapshot that has the recalibrated live bars
#    (fac5220): expect ALL-PASS incl. binary_multi_live.
#  - bench_product_binary rerun (the queue12 run completed 4096+ steps
#    rc=0/finite/no-fallback but lost its median to a JSON TypeError,
#    fixed in 9af0616).
#  - binary7: current d7b96 per-step full-step row (the r2 figure is
#    2.2 ms/step; LEAN rows + unrolled Kepler landed since).
#
# Jobs run from a GIT SNAPSHOT of HEAD taken after the queue lock is
# acquired. Logs land in benchmarks/logs_r5 and are committed per job.
# Usage: nohup bash benchmarks/run_tpu_queue13.sh > /tmp/tpu_queue13.log 2>&1 &
set -u
REPO="/root/repo"
SNAP="/tmp/q13tree"
cd "$REPO"
echo "=== TPU queue13 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue13 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue13 start; aborting"
  exit 1
fi

rm -rf "$SNAP"
mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
echo "snapshot of $(git -C "$REPO" rev-parse --short HEAD) at $SNAP"

LOGDIR="$REPO/benchmarks/logs_r5"
mkdir -p "$LOGDIR"

busywait() {
  while true; do
    [ -e /tmp/cpu_busy.flag ] || break
    echo "host busy ($(date)); waiting 30s for /tmp/cpu_busy.flag"
    sleep 30
  done
}

run() {
  local tmo="$1" name="$2"; shift 2
  busywait
  echo "--- $name start $(date)"
  ( cd "$SNAP" && timeout "$tmo" "$@" ) > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  echo "--- $name done rc=$rc $(date)"
  tail -n 4 "/tmp/q_${name}.log" | grep -v "WARNING\|cpu_aot\|machine feature" || true
  grep -v "cpu_aot_loader\|machine feature" "/tmp/q_${name}.log" \
    > "$LOGDIR/${name}.log" || true
  git -C "$REPO" add "$LOGDIR/${name}.log" 2>/dev/null
  git -C "$REPO" commit -q -m "TPU queue result: ${name} (rc=$rc, unattended capture)

No-Verification-Needed: measurement log artifact only" 2>/dev/null || true
}

# 1. value checks at the recalibrated corruption-detection bars
run 5400 smoke13 python benchmarks/smoke_r5.py

# 2. default-config product rate, fixed capture (KZPS_SUMMARY prints
#    before any encoding)
run 3600 product2 python benchmarks/bench_product_binary.py steps=4096

# 3. d7b96 per-step full-step row (the honest d7 product rate while the
#    whole-mesh multi kernel is over VMEM at 196 blocks)
run 3600 binary7 python benchmarks/bench_all.py configs=binary7 repeat=3
