#!/bin/bash
# Round-5 TPU queue, pass 2 — reordered after queue9's soak phase B
# found non-finite state at 9600 steps (phase A's 960 were clean).
# The fault-aware phase B rerun (soak_binary_multi.py phases=b) decides
# whether that NaN is a FLAGGED negative-density fault the driver
# repairs (physics: the per-step scan must fault on a similar step) or
# unflagged kernel corruption (the r4 aliasing class). It runs FIRST;
# the rest is queue9's remaining plan.
# Usage: nohup bash benchmarks/run_tpu_queue10.sh > /tmp/tpu_queue10.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== TPU queue10 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue10 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue10 start; aborting"
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

# 1. the decisive fault-aware endurance rerun (multi vs per-step)
run 5400 soak_bmulti2 python benchmarks/soak_binary_multi.py phases=b

# 1b. the PRODUCT driver through the same horizon: if phase B's NaN is
# a flagged fault, this run must show "negative density: step retried
# in safe mode" and still complete with finite checkpoints (the repair
# path riding the multi kernel end-to-end)
run 5400 soak_bmulti3 python benchmarks/soak_binary_multi.py phases=c steps_c=9600

# 2. flagship d7b96 multi rate (k ladder 16->8->4 inside bench_all)
run 7200 b7multi python benchmarks/bench_all.py configs=binary7_multi repeat=3

# 3. bf16 ceiling re-trial (fails fast on an unchanged helper)
run 2400 bf16_5 python benchmarks/bench_bf16_trial.py

# 4./5. the two 2048^2 official rows (compiles >85 min each in r4)
run 10800 khrk2 python benchmarks/bench_all.py configs=kh_rk2 repeat=3
run 10800 khhllc python benchmarks/bench_all.py configs=kh_hllc repeat=3
