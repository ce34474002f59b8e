#!/bin/bash
# Round-5 TPU queue, pass 12 — blast3d product rate at the optimized HEAD + resolved d3 marginals
#
# Jobs run from a GIT SNAPSHOT of HEAD taken after the queue lock is
# acquired. Logs land in benchmarks/logs_r5 and are committed per job.
# Usage: nohup bash benchmarks/run_tpu_queue22.sh > /tmp/tpu_queue20.log 2>&1 &
set -u
REPO="/root/repo"
SNAP="/tmp/q22tree"
cd "$REPO"
echo "=== TPU queue22 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue22 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue22 start; aborting"
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

# blast3d + sand3d jnp rates after the slice-before-gather optimization
run 3600 blast3dprod2 python -m mara3_tpu blast3d depth=4 block_size=16 tfinal=0.25 dfi=0.125 outdir=/tmp/blast3dprod2

# sand3d jnp path benefits from the same fix
run 3600 octree3 python benchmarks/bench_sand3d.py depths=3 paths=jnp

echo "=== TPU queue22 done $(date) ==="
