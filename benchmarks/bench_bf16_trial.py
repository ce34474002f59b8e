"""bf16 trial for the VPU-compute-bound uniform-grid kernel (v4).

The round-2/3 roofline (BASELINE.md) puts the f32 kernel at ~81% of the
VPU f32 speed of light; bf16 doubles VPU element throughput, so IF the
numerics hold, bf16 raises the ceiling 2x. This script applies the
PRECISION.md accept/reject methodology used for the approx-reciprocal
trial (rejected on data, benchmarks/bench_fastmath.py):

1. Throughput: v4 at the official 2048^2 config in f32 vs bf16
   (same kernel — it is dtype-generic; Mosaic picks 16-bit lanes).
2. Drift: bf16 state vs an f64 CPU reference after 100 steps
   (relative L1 per component), alongside the f32 drift for scale.

Accept iff speedup >= 1.3x AND drift/step is bounded (no blow-up) and
documented. Either way the measured numbers go to PRECISION.md.

Run detached: nohup python benchmarks/bench_bf16_trial.py > /tmp/bf16.log 2>&1 &
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as `python benchmarks/x.py`)
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mara3_tpu.kernels import iso2d_step_v4 as K4

# TX=256, G=4 is the SHIPPED v4 bench config. The trial originally ran
# TX=512 (above the ~0.5M cells/stripe VMEM compile bound) at G=8 (whose
# deeper unroll was abandoned in round 3 after a >45 min Mosaic compile)
# — that combination is what burned bf16_2's whole hour in compile.
N, TX, G = 2048, 256, 4
CS2, THETA = 0.1, 1.8


def initial_state(dtype):
    x = jnp.linspace(-1, 1, N, dtype=jnp.float64)[:, None]
    y = jnp.linspace(-1, 1, N, dtype=jnp.float64)[None, :]
    sigma = 1.0 + 0.5 * jnp.exp(-(x ** 2 + y ** 2) / 0.1)
    vx = 0.1 * jnp.sin(2 * jnp.pi * y) * jnp.ones_like(sigma)
    vy = -0.1 * jnp.sin(2 * jnp.pi * x) * jnp.ones_like(sigma)
    return jnp.stack([sigma, sigma * vx, sigma * vy], axis=0).astype(dtype)


def _stage(msg):
    # unattended queue runs get killed by timeout; stage lines make the
    # hang location visible in the captured log (bf16_2 died silently)
    print(f"[bf16 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def measure(dtype, n1=52, n2=4052, reps=3):
    dx = 2.0 / N
    dt = 1e-4
    u0 = initial_state(dtype)

    @jax.jit
    def f(n):
        out = K4.advance_n_pallas_v4(u0, n, G=G, cs2=CS2, dtdx=dt / dx,
                                     dtdy=dt / dx, theta=THETA, TX=TX)
        return jnp.sum(out[0].astype(jnp.float32))

    _stage(f"compile+warmup {dtype.__name__} n1={n1}")
    assert np.isfinite(float(f(n1)))
    _stage(f"warmup {dtype.__name__} n2={n2}")
    float(f(n2))
    _stage(f"timing {dtype.__name__}")

    def once(n):
        t0 = time.perf_counter()
        float(f(n))
        return time.perf_counter() - t0

    t1 = min(once(n1) for _ in range(reps))
    t2 = min(once(n2) for _ in range(reps))
    return N * N * (n2 - n1) / max(t2 - t1, 1e-9)


def _f64_reference(steps):
    """The f64 jnp scheme after `steps` steps, ON THE CPU BACKEND.

    Pinning matters twice over: TPU f64 transcendentals are imprecise
    (PRECISION.md), and an un-jitted per-step loop through the tunnel
    would take hours. One jitted step dispatched 100x on host CPU is
    seconds.
    """
    from mara3_tpu.schemes import iso2d_grid
    dx = 2.0 / N
    dt = 1e-4
    cpu = jax.devices("cpu")[0]
    with jax.experimental.enable_x64(), jax.default_device(cpu):
        step = jax.jit(lambda r: iso2d_grid.step_periodic_uniform(
            r, CS2, dx, dx, dt, THETA))
        ref = jax.device_put(jnp.moveaxis(initial_state(jnp.float64), 0, -1),
                             cpu)
        for _ in range(steps):
            ref = step(ref)
        return np.asarray(jnp.moveaxis(ref, -1, 0), np.float64)


def drift(dtype, ref, steps=100):
    """Relative L1 error of the dtype kernel vs the f64 CPU reference."""
    dx = 2.0 / N
    dt = 1e-4
    u = initial_state(dtype)
    out = K4.advance_n_pallas_v4(u, steps, G=G, cs2=CS2, dtdx=dt / dx,
                                 dtdy=dt / dx, theta=THETA, TX=TX)
    got = np.asarray(out, np.float64)
    return float(np.sum(np.abs(got - ref)) / np.sum(np.abs(ref)))


def main():
    zps32 = measure(jnp.float32)
    print(json.dumps({"config": "v4_2048_f32", "zps": zps32}), flush=True)
    zps16 = measure(jnp.bfloat16)
    print(json.dumps({"config": "v4_2048_bf16", "zps": zps16,
                      "speedup": zps16 / zps32}), flush=True)
    _stage("f64 CPU reference (100 steps)")
    ref = _f64_reference(100)
    _stage("drift f32")
    d32 = drift(jnp.float32, ref)
    _stage("drift bf16")
    d16 = drift(jnp.bfloat16, ref)
    print(json.dumps({"drift_rel_L1_100steps": {"f32": d32, "bf16": d16},
                      "drift_per_step": {"f32": d32 / 100,
                                         "bf16": d16 / 100}}), flush=True)


if __name__ == "__main__":
    main()
