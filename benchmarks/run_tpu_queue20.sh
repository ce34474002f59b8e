#!/bin/bash
# Round-5 TPU queue, pass 10 — the blast3d (3D Euler octree) rows
#
# Jobs run from a GIT SNAPSHOT of HEAD taken after the queue lock is
# acquired. Logs land in benchmarks/logs_r5 and are committed per job.
# Usage: nohup bash benchmarks/run_tpu_queue20.sh > /tmp/tpu_queue20.log 2>&1 &
set -u
REPO="/root/repo"
SNAP="/tmp/q20tree"
cd "$REPO"
echo "=== TPU queue20 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue20 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue20 start; aborting"
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

# 3D Euler octree advance rate + conservation check at depths 3 and 4
run 3600 blast3d python benchmarks/bench_blast3d.py depths=3,4

# product-level: the blast3d subprogram end-to-end on TPU
run 3600 blast3dprod python -m mara3_tpu blast3d depth=4 block_size=16 tfinal=0.25 dfi=0.125 outdir=/tmp/blast3dprod

echo "=== TPU queue20 done $(date) ==="
