#!/bin/bash
# Fourth-pass TPU queue (round 4): the two stragglers.
#   bf16_3   — the bf16 ceiling trial, re-armed with stage prints (bf16_2
#              died silently at timeout) and the f64 drift reference pinned
#              to the CPU backend (it was dispatching 100 un-jitted steps
#              through the tunnel).
#   bdecomp3 — flagship decomposition incl. the multi_k cases, after the
#              binary_multi VMEM fixes; per-case try/except so one failing
#              kernel can't wipe the rest.
# Start AFTER queue3 exits (shares the queue lock; launch order decides).
# Usage: nohup bash benchmarks/run_tpu_queue8.sh > /tmp/tpu_queue8.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== TPU queue8 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue8 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue8 start; aborting"
  exit 1
fi

LOGDIR="benchmarks/logs_r4"
mkdir -p "$LOGDIR"

busywait() {
  for _ in $(seq 90); do
    [ -e /tmp/cpu_busy.flag ] || break
    echo "host busy ($(date)); waiting 30s for /tmp/cpu_busy.flag"
    sleep 30
  done
}

run() {
  local tmo="$1" name="$2"; shift 2
  busywait
  echo "--- $name start $(date)"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  echo "--- $name done rc=$rc $(date)"
  tail -n 4 "/tmp/q_${name}.log" | grep -v "WARNING\|cpu_aot\|machine feature" || true
  grep -v "cpu_aot_loader\|machine feature" "/tmp/q_${name}.log" \
    > "$LOGDIR/${name}.log" || true
  git add "$LOGDIR/${name}.log" 2>/dev/null
  git commit -q -m "TPU queue result: ${name} (rc=$rc, unattended capture)

No-Verification-Needed: measurement log artifact only" 2>/dev/null || true
}

# hardware parity retest after the out-window initialization fix
# (f049de4): d4b96 k=1 + d6b96 k=4 value parity, fresh compiles
run 3600 bmnan4 python benchmarks/debug_bmulti_nan3.py

# official multi-step flagship rate, k ladder 16->8->4 (finite-checked)
run 3600 bmulti4 python benchmarks/bench_all.py configs=binary_multi repeat=3
