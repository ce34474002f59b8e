#!/bin/bash
# Round-5 TPU queue, pass 2 — hardware validation for the default flip
# and the live-binary multi kernel, plus the cloud attribution probe
# (r4 VERDICT items 2, 5, 8).
#
# Jobs run from a GIT SNAPSHOT of HEAD (never let ongoing edits reach a
# live queue). Logs land in benchmarks/logs_r5 and are committed per job.
# Usage: nohup bash benchmarks/run_tpu_queue12.sh > /tmp/tpu_queue12.log 2>&1 &
set -u
REPO="/root/repo"
SNAP="/tmp/q12tree"
cd "$REPO"
echo "=== TPU queue12 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue12 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue12 start; aborting"
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

# 1. value checks: recalibrated hybrid-vs-per-step bars, NEW live-binary
#    in-kernel path (first hardware run of 7ca8b0f), v5 stage loop,
#    cloud runtime dt
run 5400 smoke12 python benchmarks/smoke_r5.py

# 2. the default-config product run at d6b96 (multi_launch now -1 ->
#    k=16 on TPU): sustained in-run kzps through the real driver
run 3600 product python benchmarks/bench_product_binary.py steps=4096

# 3. live-multi official rate (begin_live_binary=0, k=16)
run 5400 livemulti python benchmarks/bench_all.py configs=binary_live_multi repeat=3

# 4. cloud step attribution: launch / stage-split / Newton / floor
#    (newton1 variant forces one fresh Mosaic compile)
run 10800 cloudattr python benchmarks/probe_cloud_attrib.py

# 5. headline regression guard (cache hit from bench11)
run 3600 bench12 python bench.py
