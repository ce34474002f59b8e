#!/bin/bash
# Second-pass TPU queue (round 4): re-runs everything the first pass lost
# to the benchmarks sys.path bug, plus the hardware smoke for the two
# Mosaic layout fixes (sedov scalar reads, binary_multi transposed y
# edges). Waits for the first queue's lock, then serializes as usual.
# Usage: nohup bash benchmarks/run_tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "=== TPU queue2 waiting for lock $(date) ==="

exec 9> /tmp/tpu_queue.lock
flock 9   # blocking: start the moment the first queue finishes
echo "=== TPU queue2 start $(date) ==="

for _ in $(seq 90); do
  [ -e /tmp/cpu_busy.flag ] || break
  echo "host busy ($(date)); waiting 30s for /tmp/cpu_busy.flag to clear"
  sleep 30
done

probe() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

if ! probe; then
  echo "tunnel unreachable at queue2 start; aborting"
  exit 1
fi

LOGDIR="benchmarks/logs_r4"
mkdir -p "$LOGDIR"

run() {
  local name="$1"; shift
  echo "--- $name start $(date)"
  timeout 3600 "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  echo "--- $name done rc=$rc $(date)"
  tail -n 4 "/tmp/q_${name}.log" | grep -v "WARNING\|cpu_aot\|machine feature" || true
  grep -v "cpu_aot_loader\|machine feature" "/tmp/q_${name}.log" \
    > "$LOGDIR/${name}.log" || true
  git add "$LOGDIR/${name}.log" 2>/dev/null
  git commit -q -m "TPU queue result: ${name} (rc=$rc, unattended capture)

No-Verification-Needed: measurement log artifact only" 2>/dev/null || true
}

# 1: hardware compile smoke for the two fixed kernels (fast: only the two)
run smoke2 env MARA3_TPU_SMOKE=1 python -m pytest \
    tests/test_tpu_smoke.py::test_sedov_fused_kernel_compiles_on_tpu \
    tests/test_tpu_smoke.py::test_binary_multi_kernel_compiles_on_tpu -q

# 2: the K-steps-per-launch flagship kernel vs the per-step scan
run bmulti2 python benchmarks/bench_all.py configs=binary_multi,binary repeat=3

# 3: flagship full-step decomposition (LEAN rows + unrolled Kepler)
run bdecomp2 python benchmarks/bench_binary_decomp.py

# 4: cloud chunk=1 Newton (target <= 1.8 ms/step)
run bcloud2 python benchmarks/bench_all.py configs=cloud,cloud_multi repeat=3

# 5: fused sedov/amrsand kernels (check the path field!)
run bkern2 python benchmarks/bench_all.py configs=sedov,sedov_srhd,amrsand repeat=3

# 6: bf16 ceiling trial (PRECISION.md accept/reject)
run bf16_2 python benchmarks/bench_bf16_trial.py

# 7: the rest of the smoke suite (confirm nothing else regressed)
run smoke3 env MARA3_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

# 8: the official bench again (warm caches, confirm stability)
run bench2 python bench.py

echo "=== TPU queue2 done $(date) ==="
