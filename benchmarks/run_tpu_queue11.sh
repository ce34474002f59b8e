#!/bin/bash
# Round-5 TPU queue, pass 1 — validates this round's kernel changes on
# hardware, then runs the decisive regrid soak and the khrk2 official
# row the r4 compile wall blocked.
#
# Jobs run from a GIT SNAPSHOT of HEAD (r4 lesson: never let ongoing
# edits reach a live queue — module code is read at job start, scripts
# at every byte offset). Logs land in benchmarks/logs_r5 of the REAL
# repo and are committed per job.
# Usage: nohup bash benchmarks/run_tpu_queue11.sh > /tmp/tpu_queue11.log 2>&1 &
set -u
REPO="/root/repo"
SNAP="/tmp/q11tree"
cd "$REPO"
echo "=== TPU queue11 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue11 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue11 start; aborting"
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

# 1. value-check every kernel changed this round (multi-kernel HBM u
#    input, v5 stage_loop, cloud runtime dt) against unchanged paths
run 3600 smoke11 python benchmarks/smoke_r5.py

# 2. the DECISIVE regrid soak (r4 VERDICT item 1): with the VMEM diet
#    the 136->148 regrid must STAY on the multi path (est 103 MB) and
#    finish rc=0 with finite checkpoints at 9600 steps
run 9000 soakC python benchmarks/soak_binary_multi.py phases=c steps_c=9600

# 3. kh rk2 2048^2 official row — the stage-loop kernel must compile
#    inside the job budget (unrolled blew two 90-min and one 3 h budget)
run 10800 khrk2 python benchmarks/bench_all.py configs=kh_rk2 repeat=3

# 4. rk2 VMEM anchor probe at d6b96 (guard bypassed; the result IS the
#    anchor for _DARK_FACTOR_RK2 either way)
run 7200 rk2probe python benchmarks/probe_multi_rk2_vmem.py

# 5. headline regression guard (v5 rk1/hlle path untouched -> cache hit)
run 3600 bench11 python bench.py
