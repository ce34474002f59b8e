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
# Usage: nohup bash benchmarks/run_tpu_queue7.sh > /tmp/tpu_queue7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== TPU queue7 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue7 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue7 start; aborting"
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

run 3600 bmnan3 python benchmarks/debug_bmulti_nan3.py

# the bf16 ceiling trial with the _roll fix (v4 kernel f32 round-trip)
run 3600 bf16_4 python benchmarks/bench_bf16_trial.py
