#!/bin/bash
# Round-5 TPU queue, pass 5 — final-HEAD hardware validation + the
# cloud rsqrt-first remeasure + the 3D path's hardware debut:
#  - smoke15: full smoke at HEAD incl. the NEW cloud_fused_value check
#    (fused vs jnp on hardware) — revalidates every fused kernel after
#    the cloud rsqrt-first change (binary/v5 untouched: cache-warm).
#  - cloudbench: official cloud row with the rsqrt-first HLLE sides +
#    Newton (sqrt+reciprocal -> rsqrt+mul; ~5 VPU-expensive ops saved
#    per zone-stage against the 1.603 ms compute floor).
#  - sand3d: the 3D AMR octree advance on real TPU (rate + exact
#    conservation + finiteness).
#  - bench15: final headline capture at HEAD (v5 unchanged -> cache).
#
# Jobs run from a GIT SNAPSHOT of HEAD taken after the queue lock is
# acquired. Logs land in benchmarks/logs_r5 and are committed per job.
# Usage: nohup bash benchmarks/run_tpu_queue15.sh > /tmp/tpu_queue15.log 2>&1 &
set -u
REPO="/root/repo"
SNAP="/tmp/q15tree"
cd "$REPO"
echo "=== TPU queue15 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue15 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue15 start; aborting"
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

run 5400 smoke15 python benchmarks/smoke_r5.py
run 5400 cloudbench python benchmarks/bench_all.py configs=cloud repeat=3
run 3600 sand3d python benchmarks/bench_sand3d.py
run 3600 bench15 python bench.py
