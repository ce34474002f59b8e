#!/bin/bash
# Round-5 TPU queue: the CLAUDE.md round-5 items, decisive-first.
#   soak_bmulti — binary_multi hardware soak (parity drift over 960 steps,
#                 9600-step endurance, regrid interplay end-to-end); gates
#                 making multi_launch=16 the flagship default.
#   b7multi     — flagship d7b96 multi-step rate (d6b96 is 1.74e9; the
#                 per-step advance was 2-4e9 at d7).
#   bf16_5      — bf16 ceiling re-trial: fails fast if the tunnel helper's
#                 Mosaic still lacks 16-bit rotate / odd-offset arith.
#   khrk2/khhllc — the two official 2048^2 rows whose Mosaic compiles blew
#                 a 90-min budget in r4; 3h each (r4 measured >85 min).
# Usage: nohup bash benchmarks/run_tpu_queue9.sh > /tmp/tpu_queue9.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== TPU queue9 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue9 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue9 start; aborting"
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

# 1. multi-step flagship soak: parity drift + endurance + regrid interplay
run 5400 soak_bmulti python benchmarks/soak_binary_multi.py

# 2. flagship d7b96 multi rate (k ladder 16->8->4 inside bench_all)
run 7200 b7multi python benchmarks/bench_all.py configs=binary7_multi repeat=3

# 3. bf16 ceiling re-trial (fails fast on an unchanged helper)
run 2400 bf16_5 python benchmarks/bench_bf16_trial.py

# 4./5. the two 2048^2 official rows (compiles >85 min each in r4)
run 10800 khrk2 python benchmarks/bench_all.py configs=kh_rk2 repeat=3
run 10800 khhllc python benchmarks/bench_all.py configs=kh_hllc repeat=3
